package graft

import org.apache.spark.sql.functions._

import graft.queries.{Pipeline, Relational, QueryDef}

/** End-to-end flagship invariants on sf0.001 (mirrors the reference's
  * test_estimate_queue, test/estimate_queue_test.py:117-133: run the
  * full chain, then range-assert every stored attribute). */
class PipelineSpec extends SparkSpec {

  private lazy val out = Pipeline.estimateQueue(spark, Sf0001).collect()

  test("flagship output binds to the typed Dataset[Prediction] surface") {
    import spark.implicits._
    val ds = Pipeline.estimateQueue(spark, Sf0001).as[graft.model.Prediction]
    val preds = ds.collect()
    assert(preds.length > 0)
    // typed filter/map chain over the case class
    val busy = ds.filter(_.cars > 0.0).map(p => p.station_id).collect()
    assert(busy.toSet.subsetOf(preds.map(_.station_id).toSet))
  }

  test("flagship emits one latest row per station") {
    assert(out.length > 0)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    assert(ids.sorted.sameElements(ids), "ordered by station_id")
  }

  test("flagship invariants: E9 arithmetic, E1 clamp, E2 lanes, E4 domain") {
    for (r <- out) {
      val xPos = r.getDouble(r.fieldIndex("x_pos"))
      val lanes = r.getDouble(r.fieldIndex("lanes"))
      val queueFull = r.getDouble(r.fieldIndex("queue_full"))
      val meters = r.getDouble(r.fieldIndex("meters"))
      val cars = r.getDouble(r.fieldIndex("cars"))
      val eqt = r.getDouble(r.fieldIndex("expected_queue_time"))
      assert(xPos >= 0.0)                              // E1
      assert(lanes === 1.0 || lanes === 2.0)           // E2/E3
      assert(queueFull >= 0.0 && queueFull <= 1.0)     // E3
      assert(meters >= 0.0)
      assert(eqt === cars / 74.0)                      // E9 exact
      if (xPos <= 300.0) assert(meters === 0.0)        // E7
    }
  }

  test("flagship agrees with the window-based latest-wins rendition") {
    // The max_by aggregation and the row_number window must pick the
    // same per-station row (the oracle SQL uses the window form).
    import org.apache.spark.sql.expressions.Window
    val est = graft.model.Tables.events(spark, Sf0001)
      .select(col("user_id").as("station_id"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("station_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = est.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("station_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaAgg = est.groupBy(col("station_id"))
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaAgg === viaWindow)
  }

  test("observe() collects domain-assert metrics in the flagship's own pass") {
    // E3's domain asserts (estimate_queue.py:128-133) as observed
    // metrics: piggybacked on the action that already runs, so the
    // audit costs zero extra passes — at 100 TB a second validation
    // scan is the difference between a gate and a luxury.
    // Isolated session: observe() lazily attaches a (non-serializable)
    // ObservationManager to the session, and the shared test session
    // must stay serializable for MLlib closures in other suites.
    val session = spark.newSession()
    val obs = new org.apache.spark.sql.Observation("flagship_domain")
    val df = Pipeline.estimateQueue(session, Sf0001).observe(obs,
      count(lit(1)).as("rows"),
      count_if(col("lanes") =!= 1.0 && col("lanes") =!= 2.0).as("bad_lanes"),
      count_if(col("queue_full") < 0.0 || col("queue_full") > 1.0).as("bad_full"),
      count_if(col("x_pos") < 0.0).as("bad_xpos"))
    df.collect()
    val m = obs.get
    assert(m("rows").asInstanceOf[Long] > 0L)
    assert(m("bad_lanes") === 0L)
    assert(m("bad_full") === 0L)
    assert(m("bad_xpos") === 0L)
  }

  test("gap fill emits a dense spine with no unfilled values") {
    val rows = SparkEntry.queries("q_gap_fill")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val perUser = rows.groupBy(_.getLong(0))
    for ((_, rs) <- perUser) {
      val days = rs.map(_.getLong(1))
      // dense: consecutive days exactly 86400 s apart, min to max
      assert(days.sliding(2).forall {
        case Array(a, b) => b - a == 86400L
        case _           => true
      })
      // forward fill is total (first spine day is an observed day)
      assert(rs.forall(!_.isNullAt(3)))
      // observed days carry their count; gap days carry n=0
      assert(rs.forall(r => r.getBoolean(4) == (r.getLong(2) == 0L)))
    }
  }

  test("percentile_approx stays within rank tolerance of exact") {
    val rows = QueryDef.queriesOf(Relational.all)("q_approx_quantile")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; (a, e) <- Seq(("approx_med", "exact_med"),
        ("approx_p90", "exact_p90"))) {
      val approxV = r.getDouble(r.fieldIndex(a))
      val exactV = r.getDouble(r.fieldIndex(e))
      // accuracy=10000 → rank error ≤ 1/10000 of the group; values are
      // dense doubles, so a loose 5% value tolerance is a safe bound.
      assert(math.abs(approxV - exactV) <=
        0.05 * math.max(1.0, math.abs(exactV)),
        s"$a=$approxV vs $e=$exactV")
    }
  }

  test("approx_count_distinct stays within 10% of exact (HLL bound)") {
    val rows = QueryDef.queriesOf(Relational.all)("q_approx_distinct")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val approxN = r.getLong(r.fieldIndex("approx_users"))
      val exactN = r.getLong(r.fieldIndex("exact_users"))
      assert(math.abs(approxN - exactN) <= math.max(1L, (exactN * 0.10).toLong),
        s"approx=$approxN exact=$exactN")
    }
  }
}
