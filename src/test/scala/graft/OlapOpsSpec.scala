package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Plan-shape and semantics guards for the round-10 OLAP/curation wave
  * (queries/OlapOps.scala, queries/CurateOps.scala). Answers are
  * oracle-gated; these pin the SCALE properties the rewrites exist for. */
class OlapOpsSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001)
      .queryExecution.executedPlan.toString

  test("q_star_join: three dimension joins broadcast; no cartesian product") {
    val p = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_star_join: region filter is pushed to the region scan") {
    val p = plan("q_star_join")
    // the one-row dimension filter must prune at the scan, not after
    // the join chain
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)]")
      || p.contains("EqualTo(r_name,ASIA)"), p.take(2000))
  }

  test("q_global_rank: big-side window is bucket-partitioned, not global") {
    val p = plan("q_global_rank")
    // the row_number over the full orders table must carry the bucket
    // in its partition spec — windowspecdefinition(b#..., ...)
    assert("windowspecdefinition\\(b#\\d+L".r.findFirstIn(p).nonEmpty,
      "expected the rank window partitioned by bucket b: " + p.take(1500))
  }

  test("q_global_rank: equals the single-window naive rendition") {
    val dir = Sf0001
    val got = SparkEntry.queries("q_global_rank")(spark, dir)
      .select("o_orderkey", "rnk")
    val naive = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
      .select("o_orderkey", "rnk")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("q_winsorize: clamped output never exceeds the cut points") {
    val df = SparkEntry.queries("q_winsorize")(spark, Sf0001).cache()
    try {
      val bad = df.filter(col("n_clamped_lo") + col("n_clamped_hi") > col("n") ||
        col("lo_cut") > col("hi_cut"))
      assert(bad.isEmpty, bad.collect().mkString("\n"))
      // p05/p95 clamp on ≥20 rows must clamp SOMETHING somewhere
      assert(df.agg(sum(col("n_clamped_lo") + col("n_clamped_hi"))).head.getLong(0) > 0)
    } finally df.unpersist()
  }

  test("q_hist_equidepth: bands are equal-count within one row, ordered") {
    val df = SparkEntry.queries("q_hist_equidepth")(spark, Sf0001)
    val perType = df.groupBy(col("event_type"))
      .agg(max(col("n")).as("mx"), min(col("n")).as("mn"),
        count(lit(1)).as("bands"))
      .collect()
    perType.foreach { r =>
      assert(r.getAs[Long]("bands") === 8L)
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1L,
        s"equi-depth bands must differ by at most 1 row: $r")
    }
    // bands must be value-ordered: each band's hi <= next band's lo
    val rows = df.orderBy(col("event_type"), col("band")).collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getAs[String]("event_type") == b.getAs[String]("event_type") =>
        assert(a.getAs[Double]("band_hi") <= b.getAs[Double]("band_lo"),
          s"bands overlap: $a vs $b")
      case _ => ()
    }
  }

  test("q_session_window: plans the native session-window aggregate") {
    val p = plan("q_session_window")
    assert(p.contains("session_window") || p.contains("MergingSessions"),
      "expected the native session_window operator: " + p.take(1500))
  }

  test("q_session_window: gap of exactly 30 min still MERGES (inclusive bound)") {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    val base = 1700000000000L
    val df = Seq(
      (1L, base), (1L, base + gapMs),                // exactly gap: merges
      (2L, base), (2L, base + gapMs + 1)             // beyond gap: splits
    ).toDF("uid", "ms").select(col("uid"), timestamp_millis(col("ms")).as("ts"))
    val sessions = df.groupBy(col("uid"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("uid")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getAs[Long]("uid") -> r.getAs[Long]("n_sessions")).toMap
    assert(sessions(1L) === 1L, "an event at exactly last+gap must merge")
    assert(sessions(2L) === 2L, "a strictly-larger gap starts a new session")
  }

  test("q_gopher_rules: verdict is a narrow map — no hash exchange in the plan") {
    val p = plan("q_gopher_rules")
    assert(!p.contains("Exchange hashpartitioning"),
      "quality gate must not shuffle before the verdict: " + p.take(1200))
  }

  test("q_gopher_rules: flags decompose the keep verdict") {
    val df = SparkEntry.queries("q_gopher_rules")(spark, Sf0001)
    val bad = df.filter(col("keep") =!=
      (col("r_wordcount") && col("r_meanlen") && col("r_stopword") && col("r_distinct")))
    assert(bad.isEmpty)
    // the gate must be non-trivial on this corpus: some pass, some fail
    val n = df.count()
    val kept = df.filter(col("keep")).count()
    assert(kept > 0 && kept < n, s"degenerate gate: $kept of $n")
  }

  test("q_pii_scan: every synthesized contact is found and accounted") {
    val df = SparkEntry.queries("q_pii_scan")(spark, Sf0001)
      .agg(sum("n_flagged").as("f"), sum("total_emails").as("e"),
        sum("total_phones").as("p"), sum("n_docs").as("n")).head
    val n = df.getAs[Long]("n")
    // ⌈n/3⌉-ish docs carry exactly one email + one phone each
    assert(df.getAs[Long]("e") === df.getAs[Long]("f"))
    assert(df.getAs[Long]("p") === df.getAs[Long]("f"))
    assert(df.getAs[Long]("f") === (0L until n).count(_ % 3 == 0))
  }
}
