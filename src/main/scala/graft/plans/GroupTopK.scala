package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, NullsFirst, NullsLast, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftDatasets

/** Whole-operator extension point (c): per-group top-k as a first-class
  * operator — logical node, planner strategy, and physical plan with a
  * partial (map-side) phase.
  *
  * Semantics: keep, for each group, the first `k` input rows under the
  * given total sort order (the reference's E4 "max over the calibration
  * table" / K2 "latest row per key" generalized to k > 1 — reference:
  * queue_time_predictions/estimate_queue.py:135-136, :166-178).
  *
  * Why not the built-in rendition? `row_number().over(Window.partitionBy
  * (g).orderBy(o)) <= k` buffers and FULLY SORTS every group after the
  * shuffle, and its parallelism is capped at the group-key cardinality.
  * This operator keeps a bounded k-row heap per group on each input
  * partition BEFORE the shuffle (so the exchange moves at most
  * groups × k × partitions rows, independent of input size) and merges
  * heaps after it — the same two-phase shape as partial aggregation,
  * with O(n log k) work and O(groups · k) state per task. At 100 TB the
  * shuffle volume is the difference between "all rows" and "k rows per
  * group per map task".
  */
object GroupTopK {

  /** Top `k` rows per group under `order` (column name → descending?).
    * Sort order must be total within a group for deterministic output.
    * Registers the planner strategy on the session if absent, so the
    * call works on any session (SparkSessionExtensions or not). */
  def topK(df: DataFrame, groupCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrder = order.map { case (n, desc) =>
      // Spark's default null placement per direction (ASC → NULLS FIRST).
      if (desc) SortOrder(attr(n), Descending, NullsLast, Seq.empty)
      else SortOrder(attr(n), Ascending, NullsFirst, Seq.empty)
    }
    GraftDatasets.ofRows(spark, GroupTopKNode(
      groupCols.map(attr), sortOrder, k, child))
  }
}

/** Logical node: constructed fully resolved (attributes are taken from
  * the analyzed child), so it passes straight through the analyzer. */
case class GroupTopKNode(
    groupExprs: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

/** Planner strategy: partial top-k on the map side, exchange on the
  * group keys (EnsureRequirements inserts it from the final phase's
  * required distribution), final top-k merge. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(groupExprs, order, k, child) =>
      val partial = GroupTopKExec(groupExprs, order, k, partial = true,
        planLater(child))
      GroupTopKExec(groupExprs, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical per-partition bounded-heap top-k. The same operator runs as
  * both phases: `partial = true` has no distribution requirement (runs
  * on whatever partitioning the scan produced); `partial = false`
  * requires clustering on the group keys, which plans exactly one hash
  * exchange between the phases. */
case class GroupTopKExec(
    groupExprs: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val orderLocal = order
    val outputLocal = child.output
    val kLocal = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, outputLocal)
      val ord = RowOrdering.create(orderLocal, outputLocal)
      // Max-heap under the sort order: the head is the WORST retained
      // row, evicted when a better one arrives with the heap full.
      val worstFirst = new Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new PriorityQueue[InternalRow](kLocal + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
