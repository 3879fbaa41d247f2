package graft

/** Plan-shape guards for the skew/co-location patterns in
  * queries/Scale.scala — the answer is oracle-gated; these assert the
  * SCALE property the rewrite exists for. */
class ScaleSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001)
      .queryExecution.executedPlan.toString

  test("q_join_skew_salted: join key carries the salt") {
    val p = plan("q_join_skew_salted")
    // the equi-join condition must include the salt column on both sides
    val joinLine = p.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.contains("salt"), p.take(800))
  }

  test("q_agg_salted: two aggregation stages, salted then final") {
    val p = plan("q_agg_salted")
    // partial+final per groupBy → ≥4 HashAggregates across both stages
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(800))
  }

  test("q_bucketed_join: bucketed scans, no exchange below the join") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, Sf0001)
    val p = df.queryExecution.executedPlan.toString
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, "bucketed fact-fact join should sort-merge: " + p.take(600))
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange"),
      "bucketed sides must not re-shuffle: " + below.take(800))
    assert("Bucketed: true".r.findAllIn(below).size == 2,
      "both scans must read bucketed: " + below.take(800))
    // The remaining Sort below the join is partition-local (shuffle-free)
    // and streams over one already-sorted file per bucket; Spark only
    // drops it under spark.sql.legacy.bucketedTableScan.outputOrdering.
  }
}
