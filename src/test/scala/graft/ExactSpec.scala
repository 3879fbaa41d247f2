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

  test("native dot/sumSq expressions == declarative HOF folds on real vectors") {
    import org.apache.spark.sql.functions.col
    val emb = graft.model.Tables.embeddings(spark, Sf0001)
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe")))
    val diff = pairs.select(
      (Exact.dotF(col("embedding"), col("probe")) -
        Exact.dotFDeclarative(col("embedding"), col("probe"))).as("d_dot"),
      (Exact.sumSq(col("embedding")) -
        Exact.sumSqDeclarative(col("embedding"))).as("d_ssq"))
      .agg(max(abs(col("d_dot"))).as("m1"), max(abs(col("d_ssq"))).as("m2"))
      .head
    assert(diff.getDouble(0) === 0.0, "dot must be bit-identical")
    assert(diff.getDouble(1) === 0.0, "sumSq must be bit-identical")
  }

  test("native sqDistFD == declarative decimal fold on real vectors") {
    import org.apache.spark.sql.functions.col
    val emb = graft.model.Tables.embeddings(spark, Sf0001)
    val cents = graft.queries.SimOps.centroidArrays(spark, Sf0001)
      .select(col("centroid"))
    val diff = emb.crossJoin(cents)
      .select((Exact.sqDistFD(col("embedding"), col("centroid")) -
        Exact.sqDistFDDeclarative(col("embedding"), col("centroid")))
        .as("d"))
      .agg(max(abs(col("d"))).as("m")).head
    assert(diff.getDouble(0) === 0.0, "sqDistFD must be bit-identical")
  }

  test("native expressions poison on length mismatch like zip_with") {
    val a = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val short = array(lit(1.0f), lit(2.0f))
    assert(spark.range(1).select(Exact.dotF(a, short).as("v")).head.isNullAt(0))
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
