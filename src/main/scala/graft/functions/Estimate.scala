package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression builders for the queue-estimation chain.
  *
  * Mirrors the reference's per-record arithmetic (reference:
  * queue_time_predictions/estimate_queue.py:103-163) as pure Catalyst
  * column expressions — no UDFs, so every operator stays inside
  * whole-stage codegen and is trivially distributable: at 100 TB these
  * are embarrassingly-parallel per-row projections with zero shuffle.
  *
  * Every builder has a paired `...Sql` emitter that renders the exact
  * same arithmetic as ANSI SQL (DuckDB-compatible). Query code and
  * oracle SQL are generated from the same constants and the same
  * operation order, so the two sides cannot drift and IEEE-754 results
  * match bit-for-bit.
  */
object Estimate {

  /** Haraldrud calibration geometry: camera x-pixel → meters of queue.
    * reference: estimate_queue.py:103-110 (POINTS). */
  val Points: Vector[(Double, Double)] = Vector(
    33.0 -> 0.0, 337.0 -> 14.1, 614.0 -> 40.3,
    778.0 -> 52.0, 983.0 -> 86.8, 1117.0 -> 139.4)

  /** reference: estimate_queue.py:111-116 */
  val CarDensity: Double = 0.13
  val FullThreshold: Double = 0.9
  val XPosThreshold: Double = 300.0
  val UnseenDistance: Double = 34.0
  /** reference: estimate_queue.py:155 (default inflow_rate) */
  val DefaultInflowRate: Double = 74.0

  /** Render a double so DuckDB parses back the identical IEEE-754 value. */
  def d(x: Double): String = java.lang.Double.toString(x)

  // --- E5: piecewise linear interpolation (np.interp semantics:
  // constant extrapolation outside the knot range).
  // reference: estimate_queue.py:138-140.
  // A when-chain over literal knots: constant-folded, codegen'd, and at
  // scale a branch tree per row — no lookup join, no shuffle.
  def piecewiseInterp(x: Column, pts: Seq[(Double, Double)] = Points): Column = {
    val first = when(x < lit(pts.head._1), lit(pts.head._2))
    val mid = pts.sliding(2).foldLeft(first) {
      case (acc, Seq((xa, ya), (xb, yb))) =>
        val slope = (yb - ya) / (xb - xa)
        acc.when(x < lit(xb), lit(ya) + (x - lit(xa)) * lit(slope))
      case (acc, _) => acc
    }
    mid.otherwise(lit(pts.last._2))
  }

  def piecewiseInterpSql(x: String, pts: Seq[(Double, Double)] = Points): String = {
    val sb = new StringBuilder("CASE")
    sb ++= s" WHEN ($x) < ${d(pts.head._1)} THEN ${d(pts.head._2)}"
    pts.sliding(2).foreach {
      case Seq((xa, ya), (xb, yb)) =>
        val slope = (yb - ya) / (xb - xa)
        sb ++= s" WHEN ($x) < ${d(xb)} THEN (${d(ya)} + ((($x) - ${d(xa)}) * ${d(slope)}))"
      case _ => ()
    }
    sb ++= s" ELSE ${d(pts.last._2)} END"
    sb.result()
  }

  // --- E1: clamp predicted pixel position at zero.
  // reference: estimate_queue.py:118-120.
  def clampNonNeg(c: Column): Column = greatest(c, lit(0.0))
  def clampNonNegSql(c: String): String = s"greatest($c, 0.0)"

  // --- E2: binary model output → lane count (0 → 1 lane, 1 → 2 lanes).
  // reference: estimate_queue.py:122-124. Python round() is banker's;
  // Spark bround is the faithful HALF_EVEN equivalent.
  def lanesOf(raw: Column): Column = bround(raw + lit(1.0))
  // DuckDB round() is HALF_UP (away from zero); round_even is the
  // HALF_EVEN partner of Spark bround, so the emitters agree on ties.
  def lanesOfSql(raw: String): String = s"round_even(($raw) + 1.0, 0)"

  // --- E4: full-queue saturation to the farthest calibration point.
  // reference: estimate_queue.py:112,135-136.
  def saturateIfFull(queueFull: Column, meters: Column,
      pts: Seq[(Double, Double)] = Points): Column =
    when(queueFull > lit(FullThreshold), lit(pts.map(_._2).max)).otherwise(meters)
  def saturateIfFullSql(queueFull: String, meters: String): String =
    s"CASE WHEN ($queueFull) > ${d(FullThreshold)} THEN ${d(Points.map(_._2).max)} ELSE ($meters) END"

  // --- E7: no-queue threshold: below X_POS_THRESHOLD the queue end is
  // not visible ⇒ 0 m; above it, add the unseen road distance.
  // reference: estimate_queue.py:113-116,144-150.
  def unseenAdjust(xPos: Column, meters: Column): Column =
    when(xPos > lit(XPosThreshold), meters + lit(UnseenDistance)).otherwise(lit(0.0))
  def unseenAdjustSql(xPos: String, meters: String): String =
    s"CASE WHEN ($xPos) > ${d(XPosThreshold)} THEN (($meters) + ${d(UnseenDistance)}) ELSE 0.0 END"

  // --- E8: meters → cars. reference: estimate_queue.py:111,152.
  def carsOf(meters: Column): Column = meters * lit(CarDensity)
  def carsOfSql(meters: String): String = s"(($meters) * ${d(CarDensity)})"

  // --- E9: cars → expected hours in queue.
  // reference: estimate_queue.py:155-163.
  def queueTime(cars: Column, inflowRate: Double = DefaultInflowRate): Column =
    cars / lit(inflowRate)
  def queueTimeSql(cars: String, inflowRate: Double = DefaultInflowRate): String =
    s"(($cars) / ${d(inflowRate)})"

  // --- F1: parse "station_id_<int>_<basic-ISO>.bin" object keys.
  // reference: estimate_queue.py:31-61 (regex at :38).
  val StationKeyRegex = "station_id_([0-9]+)_([0-9T]+)\\.bin"
  /** Malformed keys → NULL (the reference raises ValueError,
    * estimate_queue.py:40-45; set-at-a-time rejection is a filter).
    * regexp_extract yields '' on no-match, which ANSI cast would
    * throw on — map it to NULL first. */
  def parseStationId(key: Column): Column = {
    val m = regexp_extract(key, StationKeyRegex, 1)
    when(m === "", lit(null)).otherwise(m).cast("long")
  }
  /** Strict-mode F1: the reference RAISES ValueError on a malformed
    * key (estimate_queue.py:40-45); this is that fail-fast twin of
    * parseStationId's NULL-rejection — any row whose key misses the
    * regex aborts the job with the offending key in the message.
    * Pure Catalyst (CaseWhen branches are lazily evaluated, so the
    * raise_error arm costs nothing on valid rows and stays inside
    * whole-stage codegen). */
  def parseStationIdStrict(key: Column): Column =
    when(key.rlike(StationKeyRegex),
      regexp_extract(key, StationKeyRegex, 1).cast("long"))
      .otherwise(raise_error(concat(lit("malformed station key: "), key)))

  /** Timestamp part of the key, NULL on malformed keys ('' would
    * throw downstream in ANSI to_timestamp — same landmine class as
    * parseStationId's cast). */
  def parseStationTs(key: Column): Column = {
    val m = regexp_extract(key, StationKeyRegex, 2)
    when(m === "", lit(null)).otherwise(m)
  }

  /** Naive basic-ISO local timestamp in Europe/Oslo → POSIX epoch seconds.
    * reference: estimate_queue.py:49-51 (isoparse + tz.gettz("Europe/Oslo")
    * + .timestamp()); golden: "20200506T094000" → 1588750800
    * (test/estimate_queue_test.py:30). Session TZ is pinned UTC, so the
    * conversion is explicit. */
  def osloEpoch(tsBasicIso: Column): Column =
    unix_timestamp(to_utc_timestamp(
      to_timestamp(tsBasicIso, "yyyyMMdd'T'HHmmss"), "Europe/Oslo"))
}
