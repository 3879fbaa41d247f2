package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for the hidden time-transform layout ([[TimeSplit]],
  * `PARTITIONED BY (days(ts) | hours(ts))`) beyond what
  * q_layout_time's oracle gate proves: layout EVOLUTION
  * (set_layout → mixed generations → DROP PARTITION refusal →
  * compact migration), the hours() variant, create-time validation,
  * RENAME following the spec, and day-scoped compaction. */
class TimeLayoutSpec extends graft.SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-timelayout").toString
    spark.conf.set("spark.sql.catalog.gtls", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtls.warehouse", d)
    d
  }

  override def beforeAll(): Unit = { super.beforeAll(); val _ = wh }

  /** 4 UTC days of hourly rows starting 2024-03-01. */
  private def hourly(n: Int): DataFrame =
    spark.range(0, n).select(col("id").as("event_id"),
      expr("timestamp_micros(CAST(1709251200000000 + id * 3600000000 " +
        "AS BIGINT))").as("ts"),
      (col("id") * 2.5).as("value"))

  private def planned(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2
        .BatchScanExec => b.inputPartitions.length
    }.getOrElse(-1)

  test("layout evolution: set_layout days, straddlers refuse DROP, " +
      "compact migrates") {
    spark.sql(s"CREATE TABLE gtls.ns.evo (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE)")
    // hash-scatter the rows so every pre-layout part STRADDLES days
    // (an ordered write would accidentally land single-day parts —
    // detection-over-declaration would then just accept them)
    hourly(96).repartition(3, col("event_id"))
      .createOrReplaceTempView("gtls_evo_src")
    spark.sql("INSERT INTO gtls.ns.evo SELECT * FROM gtls_evo_src")
    spark.sql("CALL gtls.system.set_layout(table => 'ns.evo', " +
      "spec => 'days(ts)')")
    // SHOW PARTITIONS lists only PROVABLY single-day parts — the
    // straddling pre-layout generation contributes nothing
    assert(spark.sql("SHOW PARTITIONS gtls.ns.evo").count() === 0)
    // a post-layout INSERT lands day parts next to the straddlers
    hourly(24).createOrReplaceTempView("gtls_evo_src2")
    spark.sql("INSERT INTO gtls.ns.evo SELECT * FROM gtls_evo_src2")
    assert(spark.sql("SHOW PARTITIONS gtls.ns.evo").count() === 1)
    // the listed day still can't drop: pre-layout parts MAY hold its
    // rows — the metadata drop refuses with the migration hint,
    // never half-applies
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE gtls.ns.evo DROP PARTITION (ts_day = DATE'2024-03-01')"))
    assert(e.getMessage.contains("compact"), e.getMessage)
    // compaction migrates everything to the head spec: one part/day
    spark.sql("CALL gtls.system.compact(table => 'ns.evo', " +
      "target_parts => 4)")
    assert(spark.sql("SHOW PARTITIONS gtls.ns.evo").count() === 4)
    assert(spark.sql("SELECT count(*) FROM gtls.ns.evo.files")
      .head.getLong(0) === 4)
    // post-migration the metadata drop works (day0 = 24 + 24 rows)
    spark.sql(
      "ALTER TABLE gtls.ns.evo DROP PARTITION (ts_day = DATE'2024-03-01')")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.evo")
      .head.getLong(0) === 72)
    assert(spark.sql("SHOW PARTITIONS gtls.ns.evo").count() === 3)
    // further INSERTs route through the day layout
    spark.sql("INSERT INTO gtls.ns.evo SELECT * FROM gtls_evo_src2")
    assert(spark.sql("SHOW PARTITIONS gtls.ns.evo").count() === 4)
  }

  test("hours() variant: ordinal partitions, range pruning") {
    spark.sql("CREATE TABLE gtls.ns.hr (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE) PARTITIONED BY (hours(ts))")
    // 6 hours, 10 rows each (6-minute cadence)
    spark.range(0, 60).select(col("id").as("event_id"),
      expr("timestamp_micros(CAST(1709251200000000 + id * 360000000 " +
        "AS BIGINT))").as("ts"), lit(1.0).as("value"))
      .createOrReplaceTempView("gtls_hr_src")
    spark.sql("INSERT INTO gtls.ns.hr SELECT * FROM gtls_hr_src")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.hr.files")
      .head.getLong(0) === 6)
    val parts = spark.sql("SHOW PARTITIONS gtls.ns.hr").collect()
      .map(_.getString(0)).sorted
    assert(parts.length === 6 && parts.head.startsWith("ts_hour="))
    val q = spark.sql("SELECT * FROM gtls.ns.hr WHERE " +
      "ts >= TIMESTAMP'2024-03-01 02:00:00' AND " +
      "ts < TIMESTAMP'2024-03-01 04:00:00'")
    assert(planned(q) === 2)
    assert(q.count() === 20)
    // hour-ordinal drop (BIGINT partition value)
    val h0 = 1709251200000000L / 3600000000L
    spark.sql(s"ALTER TABLE gtls.ns.hr DROP PARTITION (ts_hour = $h0)")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.hr")
      .head.getLong(0) === 50)
  }

  test("create-time validation: days() needs a TIMESTAMP column") {
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gtls.ns.bad (k BIGINT, v DOUBLE) " +
        "PARTITIONED BY (days(k))"))
    assert(e.getMessage.contains("TIMESTAMP"), e.getMessage)
  }

  test("RENAME COLUMN follows the transform spec") {
    spark.sql("CREATE TABLE gtls.ns.rn (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE) PARTITIONED BY (days(ts))")
    hourly(48).createOrReplaceTempView("gtls_rn_src")
    spark.sql("INSERT INTO gtls.ns.rn SELECT * FROM gtls_rn_src")
    spark.sql("ALTER TABLE gtls.ns.rn RENAME COLUMN ts TO captured_at")
    // per-part stats stay keyed by their WRITE-TIME name (the retired
    // name is never reused, so consulting them under the old key is
    // provably sound — and under the NEW name they simply don't
    // resolve): the listing degrades to empty, never to wrong
    assert(spark.sql("SHOW PARTITIONS gtls.ns.rn").count() === 0)
    // later INSERTs record stats under the new name and route by the
    // derived day — the transform followed the rename
    spark.sql("INSERT INTO gtls.ns.rn SELECT event_id, ts, value " +
      "FROM gtls_rn_src WHERE event_id < 24")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.rn.files")
      .head.getLong(0) === 3)
    val afterInsert = spark.sql("SHOW PARTITIONS gtls.ns.rn").collect()
      .map(_.getString(0))
    assert(afterInsert.toSeq === Seq("captured_at_day=2024-03-01"),
      afterInsert.mkString(","))
    // ANALYZE refreshes every part's stats under the CURRENT name —
    // the pre-rename parts come back into the listing
    spark.sql("CALL gtls.system.analyze(table => 'ns.rn')")
    assert(spark.sql("SHOW PARTITIONS gtls.ns.rn").count() === 2)
    spark.sql("ALTER TABLE gtls.ns.rn " +
      "DROP PARTITION (captured_at_day = DATE'2024-03-02')")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.rn")
      .head.getLong(0) === 48)
  }

  test("day-scoped compaction packs one day only") {
    spark.sql("CREATE TABLE gtls.ns.sc (event_id BIGINT, " +
      "ts TIMESTAMP, value DOUBLE) PARTITIONED BY (days(ts))")
    hourly(48).createOrReplaceTempView("gtls_sc_src")
    // two writes → two parts per day
    spark.sql("INSERT INTO gtls.ns.sc SELECT * FROM gtls_sc_src " +
      "WHERE event_id % 2 = 0")
    spark.sql("INSERT INTO gtls.ns.sc SELECT * FROM gtls_sc_src " +
      "WHERE event_id % 2 = 1")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.sc.files")
      .head.getLong(0) === 4)
    val d0 = 1709251200000000L / 86400000000L
    val r = spark.sql("CALL gtls.system.compact(table => 'ns.sc', " +
      s"target_parts => 1, split_value => '$d0')").head
    assert(r.getInt(0) === 2 && r.getInt(1) === 1, r.toString)
    assert(spark.sql("SELECT count(*) FROM gtls.ns.sc.files")
      .head.getLong(0) === 3)
    assert(spark.sql("SELECT count(*) FROM gtls.ns.sc")
      .head.getLong(0) === 48)
  }

  test("CTAS is born with the days layout") {
    hourly(48).createOrReplaceTempView("gtls_ctas_src")
    spark.sql("CREATE TABLE gtls.ns.ct PARTITIONED BY (days(ts)) AS " +
      "SELECT * FROM gtls_ctas_src")
    assert(spark.sql("SELECT count(*) FROM gtls.ns.ct.files")
      .head.getLong(0) === 2)
    assert(spark.sql("SHOW PARTITIONS gtls.ns.ct").count() === 2)
    val q = spark.sql("SELECT * FROM gtls.ns.ct WHERE " +
      "ts < TIMESTAMP'2024-03-02 00:00:00'")
    assert(planned(q) === 1 && q.count() === 24)
  }
}
