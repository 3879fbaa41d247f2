package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, CreateNamedStruct, DynamicPruningExpression, NamedExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{InSubqueryExec, ProjectExec, SparkPlan, SubqueryExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Make the MATCHED-KEY dynamic group filter of row-level operations
  * actually reach the manifest's part pruning.
  *
  * Spark's `RowLevelOperationRuntimeGroupFiltering` builds ONE
  * runtime subquery over ALL of a scan's advertised
  * `filterAttributes()` and compares them as a `named_struct(...) IN
  * (subquery)` — but `BatchScanExec`'s runtime-filter translation
  * (`translateRuntimeFilterV2`) only converts a SINGLE-COLUMN
  * `InSubqueryExec` into a source `In` filter. A multi-column struct
  * never translates, so the scan's `SupportsRuntimeFiltering.filter`
  * is never called and a MERGE rewrites every candidate part — the
  * group filter silently evaporates exactly on the tables that
  * advertise rich stats (key + string + secondary ColStats).
  *
  * This physical preparation rule (injected via
  * `injectQueryStagePrepRule`) restores the filter: for a row-level
  * manifest scan carrying a struct-valued dynamic pruning
  * expression, it re-points the subquery at ONE column — the scan's
  * KEY column when present (bloom + range pruning, the tightest
  * single-column footprint), else the first struct field — by
  * projecting the already-planned matching-rows subquery onto that
  * field. One column is SUFFICIENT for exact part pruning here
  * because the subquery's rows are the MATCHED TARGET ROWS
  * themselves: any column's value set is consistent with exactly
  * the parts those rows live in, so `In(key, matchedKeys)` prunes
  * to precisely the parts the rewrite must touch (a bloom false
  * positive keeps a part, which merely rewrites it unchanged —
  * prune-safe by construction). Dropping struct fields only WEAKENS
  * pruning, never changes which rows match — the row-level join
  * still decides every surviving row.
  *
  * At 100 TB this is the difference between "MERGE rewrites the 3
  * parts holding matched keys" and "MERGE rewrites all 100k
  * candidate parts": the whole point of group-based row-level
  * operations. RowLevelSpec pins the 1-of-5 footprint for a MERGE
  * keyed on a SECONDARY column (pure ColStat pruning) and the
  * null-count-bounded UPDATE.
  */
case class SplitRowLevelDpp(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case scan: BatchScanExec if scan.runtimeFilters.nonEmpty &&
        scan.scan.isInstanceOf[ManifestScan] &&
        scan.scan.asInstanceOf[ManifestScan].isRowLevelScan =>
      val ms = scan.scan.asInstanceOf[ManifestScan]
      var changed = false
      val newFilters = scan.runtimeFilters.map {
        case DynamicPruningExpression(InSubqueryExec(
            struct: CreateNamedStruct, sub: SubqueryExec, _, _, _, _))
            if struct.valExprs.length > 1 &&
              struct.valExprs.length == sub.child.output.length =>
          // prefer the key column (bloom + range beats range-only)
          val idx = math.max(0, struct.valExprs.indexWhere {
            case a: AttributeReference => ms.keyColName.contains(a.name)
            case _ => false
          })
          struct.valExprs(idx) match {
            case a: AttributeReference =>
              changed = true
              val field = sub.child.output(idx)
              DynamicPruningExpression(InSubqueryExec(a,
                SubqueryExec(s"graft-rowlevel-groupfilter [${a.name}]",
                  ProjectExec(Seq(field), sub.child)),
                NamedExpression.newExprId))
            case _ =>
              DynamicPruningExpression(InSubqueryExec(
                struct, sub, NamedExpression.newExprId))
          }
        case other => other
      }
      if (changed) scan.copy(runtimeFilters = newFilters) else scan
  }
}
