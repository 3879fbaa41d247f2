package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Order-independence and golden values for the exact-decimal
  * aggregation helpers (the property the 100 TB design rests on:
  * any partitioning/merge order → identical bits). */
class ExactSpec extends SparkSpec {

  test("decSum is partition-order independent and exact") {
    import spark.implicits._
    val xs = (1 to 1000).map(i => i * 0.01)
    val expected = BigDecimal(xs.map(BigDecimal(_)).sum.toDouble).toDouble
    for (parts <- Seq(1, 7, 32)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(Exact.decSum(col("x"), 2).as("s")).head.getDouble(0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("decAvg matches sum/count") {
    import spark.implicits._
    val xs = Seq(1.25, 2.5, 3.75, -1.0)
    val got = xs.toDF("x").agg(Exact.decAvg(col("x"), 2).as("a")).head.getDouble(0)
    assert(got === (1.25 + 2.5 + 3.75 - 1.0) / 4.0)
  }

  test("dotF and sumSq golden values") {
    val a = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val b = array(lit(4.0f), lit(-5.0f), lit(6.0f))
    assert(evalD(Exact.dotF(a, b)) === (4.0 - 10.0 + 18.0))
    assert(evalD(Exact.sumSq(a)) === (1.0 + 4.0 + 9.0))
  }

  test("cosineF: identical → 1, orthogonal → 0, opposite → -1") {
    val a = array(lit(1.0f), lit(2.0f))
    val o = array(lit(-2.0f), lit(1.0f))
    val n = array(lit(-1.0f), lit(-2.0f))
    assert(approx(evalD(Exact.cosineF(a, a)), 1.0))
    assert(evalD(Exact.cosineF(a, o)) === 0.0)
    assert(approx(evalD(Exact.cosineF(a, n)), -1.0))
  }
}
