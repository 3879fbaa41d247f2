package graft

import org.apache.spark.sql.types._

import graft.model.Tables

/** Testdata-drift canary. The driver REGENERATES `/root/testdata`
  * between rounds and has already changed physical storage types
  * under us once (round 11: `events.ts` timestamp[ns] →
  * timestamp[us]/NTZ — 73 queries and 7 streaming gates failed with
  * NO code change). This spec pins the LOGICAL schema contract every
  * query is written against, per scale factor, so the next drift
  * fails here first with a diagnosis instead of as a wall of
  * AnalysisExceptions in the driver's correctness artifact. */
class TablesSpec extends SparkSpec {

  private val dirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events normalizes to the logical schema at every SF (ts: TimestampType LTZ)") {
    for (d <- dirs) {
      val s = Tables.events(spark, d).schema
      assert(s.fieldNames.toSeq ===
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"), d)
      assert(s("ts").dataType === TimestampType,
        s"$d: events.ts must normalize to TimestampType — if this fails " +
          "after a testdata regeneration, the STORAGE type drifted again; " +
          "extend Tables.eventsFromStorage's dispatch (see the round-11 " +
          "post-mortem in COVERAGE.md)")
      assert(s("event_id").dataType === LongType, d)
      assert(s("value").dataType === DoubleType, d)
    }
  }

  test("every table loads and the date/key columns carry query-compatible types") {
    for (d <- dirs) {
      assert(Tables.lineitem(spark, d).schema("l_shipdate").dataType
        match {
        case TimestampType | TimestampNTZType | DateType => true
        case other => fail(s"$d: l_shipdate drifted to $other"); false
      }, d)
      assert(Tables.orders(spark, d).schema("o_orderdate").dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case other => fail(s"$d: o_orderdate drifted to $other"); false
      }, d)
      assert(Tables.embeddings(spark, d).schema("embedding").dataType ===
        ArrayType(FloatType, containsNull = true), d)
      assert(Tables.documents(spark, d).schema("text").dataType === StringType, d)
      // one-row action per table: the read path itself must not throw
      for (t <- Seq("region", "nation", "customer", "supplier", "part"))
        assert(Tables.load(spark, d, t).limit(1).count() === 1, s"$d/$t")
    }
  }

  test("streaming storage schema matches what the batch reader yields") {
    // eventsStorageSchema feeds readStream (schemas cannot be inferred
    // there); if it diverges from the files, streams mis-window or
    // zero out silently — this was half the round-11 failure
    val byStorage = Tables.eventsFromStorage(
      spark.read.schema(Tables.eventsStorageSchema)
        .parquet(s"$Sf0001/events.parquet"))
    val byBatch = Tables.events(spark, Sf0001)
    assert(byStorage.schema === byBatch.schema)
    assert(byStorage.count() === byBatch.count())
    // same instants, not just same types
    import org.apache.spark.sql.functions._
    val a = byStorage.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val b = byBatch.agg(max(unix_micros(col("ts")))).head.getLong(0)
    assert(a === b, "storage-schema read must yield the same instants")
  }
}
