package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** STRUCTURAL physical-plan probes for the live gates and specs —
  * the executed-plan twin of [[MvRewrite.readsManifestDir]]. A
  * `plan.toString.contains("ManifestAggScan")` gate silently decays
  * the moment a node's rendering changes; these walk the actual
  * operator tree (AQE-unwrapped: [[AdaptiveSparkPlanExec]] is a LEAF
  * wrapper over its live `executedPlan`, so a plain `collect` never
  * sees through it) and test the scan objects themselves. */
object PlanProbes {

  /** Every node of the plan with AQE wrappers flattened away. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case n => Seq(n)
  }.flatten

  /** True iff the aggregate was answered METADATA-ONLY: the plan's
    * scan leaf is the [[ManifestAggScan]] the source substituted
    * under complete aggregate pushdown, and no aggregate exec
    * survives above it (complete pushdown removes the final
    * aggregation — a partial pushdown would keep one and must NOT
    * count as metadata-only). */
  def aggPushedDown(p: SparkPlan): Boolean = {
    val ns = nodes(p)
    ns.exists {
      case b: BatchScanExec => b.scan.isInstanceOf[ManifestAggScan]
      case _ => false
    } && !ns.exists(_.isInstanceOf[BaseAggregateExec])
  }

  /** The manifest-table scans' own descriptions (the live
    * [[ManifestScan]] renders `parts=planned/total`, narrowing in
    * place when a runtime-filter value set arrives — so gates read
    * the description AFTER execution). Matching is structural (the
    * scan object's type), only the returned payload is the scan's
    * self-description. */
  def manifestScanDescs(p: SparkPlan): Seq[String] =
    nodes(p).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[ManifestScan] =>
        b.simpleString(500)
    }
}
