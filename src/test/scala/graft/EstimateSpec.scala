package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Estimate
import graft.functions.Estimate._

/** Ports the reference's unit + property tests verbatim
  * (reference: test/estimate_queue_test.py). */
class EstimateSpec extends SparkSpec {

  // --- F1 golden parse (test/estimate_queue_test.py:29-39).
  test("osloEpoch golden: 20200506T094000 → 1588750800 (CEST, UTC+2)") {
    assert(evalOne[Long](osloEpoch(lit("20200506T094000"))) === 1588750800L)
  }

  test("osloEpoch handles CET (winter, UTC+1)") {
    // 2020-01-15T10:00 Oslo (CET, UTC+1) = 09:00 UTC = 1579078800
    assert(evalOne[Long](osloEpoch(lit("20200115T100000"))) === 1579078800L)
  }

  test("parseStationId golden + malformed keys reject as NULL") {
    assert(evalOne[Long](
      parseStationId(lit("station_id_41_20200506T094000.bin"))) === 41L)
    // reference raises ValueError (:40-45); the set-at-a-time engine
    // rejects via NULL → filter.
    for (bad <- Seq("station_id_x_20200506T094000.bin",
        "nonsense.bin", "station_id_41.bin")) {
      assert(spark.range(1).select(parseStationId(lit(bad)).as("v"))
        .head.isNullAt(0), s"expected NULL for $bad")
      // the ts side must also NULL out (and survive the epoch chain)
      assert(spark.range(1)
        .select(osloEpoch(parseStationTs(lit(bad))).as("v"))
        .head.isNullAt(0), s"expected NULL epoch for $bad")
    }
  }

  // --- F1 strict mode (estimate_queue.py:40-45 raises ValueError).
  test("parseStationIdStrict: valid key parses, malformed key fails fast") {
    assert(evalOne[Long](
      parseStationIdStrict(lit("station_id_41_20200506T094000.bin"))) === 41L)
    val e = intercept[Throwable] {
      spark.range(1)
        .select(parseStationIdStrict(lit("nonsense.bin")).as("v")).head
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("malformed station key"), msgs)
  }

  // --- E5 interpolation (np.interp semantics, estimate_queue.py:138-140).
  test("piecewiseInterp hits every calibration knot exactly") {
    for ((x, m) <- Estimate.Points)
      assert(evalD(piecewiseInterp(lit(x))) === m, s"knot $x")
  }

  test("piecewiseInterp midpoints + constant extrapolation") {
    // midpoint of (33,0)-(337,14.1): np.interp(185.0) = 7.05
    assert(approx(evalD(piecewiseInterp(lit(185.0))), 7.05))
    // constant extrapolation outside the knot range
    assert(evalD(piecewiseInterp(lit(-50.0))) === 0.0)
    assert(evalD(piecewiseInterp(lit(0.0))) === 0.0)
    assert(evalD(piecewiseInterp(lit(5000.0))) === 139.4)
  }

  test("piecewiseInterp is monotone non-decreasing over a dense grid") {
    val xs = (0 to 1200 by 7).map(_.toDouble)
    val ys = spark.createDataFrame(xs.map(Tuple1(_))).toDF("x")
      .select(col("x"), piecewiseInterp(col("x")).as("y"))
      .orderBy(col("x")).collect().map(_.getDouble(1))
    ys.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => () }
  }

  /** Full E1–E9 cars chain, as estimate_cars composes it
    * (estimate_queue.py:118-152). */
  private def cars(xPos: Double, lanesRaw: Double, queueFull: Double): Double = {
    val x = clampNonNeg(lit(xPos))
    val lanes = lanesOf(lit(lanesRaw))
    val meters = unseenAdjust(x,
      saturateIfFull(lit(queueFull), piecewiseInterp(x)) * lanes)
    evalD(carsOf(meters))
  }

  // --- test_estimate_cars_at_haraldrud (test/estimate_queue_test.py:68-94).
  test("cars: zero at/below the no-queue threshold") {
    assert(cars(0.0, 0.0, 0.0) === 0.0)
    assert(cars(300.0, 0.0, 0.0) === 0.0)
    assert(cars(-10.0, 1.0, 0.0) === 0.0)
  }

  test("cars: positive above the threshold") {
    assert(cars(500.0, 0.0, 0.0) > 0.0)
  }

  test("cars: monotone in lanes") {
    assert(cars(500.0, 1.0, 0.0) >= cars(500.0, 0.0, 0.0))
  }

  test("cars: lanes irrelevant when queue end is not visible") {
    assert(cars(100.0, 1.0, 0.0) === cars(100.0, 0.0, 0.0))
  }

  test("cars: full-queue saturation ≡ huge x position") {
    assert(cars(400.0, 0.0, 0.95) === cars(1e9, 0.0, 0.0))
  }

  test("lanesOf decodes the binary head: 0 → 1 lane, 1 → 2 lanes") {
    assert(evalD(lanesOf(lit(0.0))) === 1.0)
    assert(evalD(lanesOf(lit(1.0))) === 2.0)
    assert(evalD(lanesOf(lit(0.2))) === 1.0)   // rounds to nearest
  }

  // --- test_estimate_time_in_queue exact arithmetic (:97-100).
  test("queueTime exact arithmetic: 5/70 and 10/1") {
    assert(evalD(queueTime(lit(5.0), 70.0)) === 5.0 / 70.0)
    assert(evalD(queueTime(lit(10.0), 1.0)) === 10.0)
  }

  test("saturateIfFull saturates only above the 0.9 threshold") {
    assert(evalD(saturateIfFull(lit(0.95), lit(7.0))) === 139.4)
    assert(evalD(saturateIfFull(lit(0.9), lit(7.0))) === 7.0)
    assert(evalD(saturateIfFull(lit(0.1), lit(7.0))) === 7.0)
  }
}
