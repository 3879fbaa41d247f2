package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.model.Tables
import graft.streaming.Streams

/** Stream-vs-batch equivalence: the same plan over the same data must
  * produce identical results whether run as a stream (AvailableNow)
  * or as a batch DataFrame (SURVEY §5 test plan, item e). */
class StreamingSpec extends SparkSpec {

  private def q(name: String) = Streams.all.find(_.name == name).get.fn

  test("tumbling-window stream == batch window aggregation") {
    val stream = q("q_stream_tumbling")(spark, Sf0001).collect().toSet
    val batch = Tables.events(spark, Sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.decSum(col("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("event_type"), col("n"), col("sum_value"))
      .collect().toSet
    assert(stream === batch)
  }

  test("stateful stream dedup == batch DISTINCT") {
    val stream = q("q_stream_dedup")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(stream === batch)
  }

  test("foreachBatch upsert == batch latest-wins aggregation") {
    val stream = q("q_stream_upsert")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap   // user_id -> last_event_id
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stream === batch)
  }

  test("session windows cover every pre-watermark event exactly once") {
    val sessions = q("q_stream_session")(spark, Sf0001).collect()
    val nInSessions = sessions.map(_.getLong(3)).sum
    val ev = Tables.events(spark, Sf0001)
      .select(unix_micros(col("ts")).as("us")).collect().map(_.getLong(0))
    assert(nInSessions > 0)
    assert(nInSessions <= ev.length)
    // session bounds are well-formed: end = at least start + gap
    for (s <- sessions)
      assert(s.getLong(2) >= s.getLong(1) + 1800000000L)
  }
}
