package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Estimate
import graft.model.Tables

/** The flagship query: the reference's full estimation semantics —
  * scan → JSON parse → scalar transforms → conditional expressions →
  * piecewise interpolation → keyed latest-wins upsert — re-expressed
  * set-at-a-time over the `events` table.
  *
  * reference pipeline: estimate_queue.py:181-192 (E1..E9 chain at
  * :118-163, DynamoDB upsert at :166-178). One webcam observation per
  * Luigi container run becomes "all stations × all timestamps" in a
  * single declarative plan.
  *
  * Scale notes (100 TB): everything before the final aggregation is a
  * per-row projection fused into one WholeStageCodegen over the scan —
  * zero shuffles. The latest-per-station upsert is a max_by hash
  * aggregation: map-side partial aggregation collapses every partition
  * to ≤ #stations rows before the single shuffle, and no sort happens
  * anywhere. No collect, no driver-side loops.
  */
object Pipeline {

  /** events.value (0..~330) → synthetic camera x-pixel domain (0..~1320)
    * spanning the calibration range [33, 1117]. */
  val XScale = 4.0

  def estimateQueue(spark: SparkSession, dir: String): DataFrame = {
    import Estimate._
    val ev = Tables.events(spark, dir)

    val base = ev.select(
      col("user_id").as("station_id"),
      col("ts"),
      col("event_id"),
      clampNonNeg(col("value") * lit(XScale)).as("x_pos"),                 // E1
      least(get_json_object(col("props"), "$.k").cast("double") / lit(100.0),
        lit(1.0)).as("queue_full"),
      (col("event_id") % 2).cast("double").as("lanes_raw"))

    val est = base
      .withColumn("lanes", lanesOf(col("lanes_raw")))                      // E2
      .withColumn("meters_interp", piecewiseInterp(col("x_pos")))          // E5
      .withColumn("meters_sat", saturateIfFull(col("queue_full"), col("meters_interp"))) // E4
      .withColumn("meters_lanes", col("meters_sat") * col("lanes"))        // E6
      .withColumn("meters", unseenAdjust(col("x_pos"), col("meters_lanes"))) // E7
      .withColumn("cars", carsOf(col("meters")))                           // E8
      .withColumn("expected_queue_time", queueTime(col("cars")))           // E9

    // K2: keyed last-write-wins upsert — latest observation per station,
    // as a max_by AGGREGATION rather than a ranking window: the partial
    // (map-side) aggregate reduces each partition to one row per station
    // BEFORE the shuffle, so parallelism is unbounded and no per-station
    // sort ever happens — the scale-safe plan at 1000 executors, where a
    // partitionBy(station_id) window would cap out at #stations tasks
    // and sort each station's full history.
    // reference: estimate_queue.py:166-178 (DynamoDB update_item).
    val ord = struct(col("ts"), col("event_id"))
    val payload = struct(
      unix_timestamp(col("ts")).as("obs_ts"),
      col("x_pos"), col("lanes"), col("queue_full"),
      col("meters"), col("cars"), col("expected_queue_time"))
    est.groupBy(col("station_id"))
      .agg(max_by(payload, ord).as("r"))
      .select(col("station_id"), col("r.obs_ts"), col("r.x_pos"), col("r.lanes"),
        col("r.queue_full"), col("r.meters"), col("r.cars"),
        col("r.expected_queue_time"))
      .orderBy(col("station_id"))
  }

  val estimateQueueSql: String = {
    import Estimate._
    val interp = piecewiseInterpSql("x_pos")
    val sat = saturateIfFullSql("queue_full", "meters_interp")
    val unseen = unseenAdjustSql("x_pos", "meters_lanes")
    s"""WITH base AS (
  SELECT user_id AS station_id, ts, event_id,
    ${clampNonNegSql(s"value * ${d(XScale)}")} AS x_pos,
    least(CAST(json_extract_string(props, '$$.k') AS DOUBLE) / 100.0, 1.0) AS queue_full,
    CAST(event_id % 2 AS DOUBLE) AS lanes_raw
  FROM events
), e1 AS (
  SELECT *, ${lanesOfSql("lanes_raw")} AS lanes, $interp AS meters_interp FROM base
), e2 AS (
  SELECT *, $sat AS meters_sat FROM e1
), e3 AS (
  SELECT *, meters_sat * lanes AS meters_lanes FROM e2
), e4 AS (
  SELECT *, $unseen AS meters FROM e3
), e5 AS (
  SELECT *, ${carsOfSql("meters")} AS cars FROM e4
), est AS (
  SELECT *, ${queueTimeSql("cars")} AS expected_queue_time FROM e5
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY station_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM est
)
SELECT station_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS obs_ts,
  x_pos, lanes, queue_full, meters, cars, expected_queue_time
FROM ranked WHERE rn = 1
ORDER BY station_id"""
  }
}
