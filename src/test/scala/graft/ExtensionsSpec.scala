package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.plans.DotSelfToSumSq

/** The custom optimizer rule rewrites self-dot to sumSq — provably
  * bit-exact and visible in the optimized plan. */
class ExtensionsSpec extends SparkSpec {

  test("dot(x, x) rewrites to sumSq(x) and preserves every bit") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotSelfToSumSq
    try {
      val emb = graft.model.Tables.embeddings(spark, Sf0001)
      val df = emb.select(col("vec_id"),
        Exact.dotF(col("embedding"), col("embedding")).as("selfdot"),
        Exact.sumSq(col("embedding")).as("ssq"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("exactdotproduct"),
        "self-dot must be rewritten away: " + optimized.take(400))
      assert(optimized.contains("exactsumsq"), optimized.take(400))
      val mismatch = df.filter(col("selfdot") =!= col("ssq")).count()
      assert(mismatch === 0L)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotSelfToSumSq)
    }
  }

  test("rule leaves genuine two-vector dots untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotSelfToSumSq
    try {
      // non-literal inputs (literals would constant-fold the dot away
      // before the rule is even consulted — itself proof the native
      // expression composes with ConstantFolding)
      val a = array(col("id").cast("float"), lit(2.0f))
      val b = array(lit(3.0f), lit(4.0f))
      val df = spark.range(1, 2).select(Exact.dotF(a, b).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("exactdotproduct"))
      assert(df.head.getDouble(0) === 11.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotSelfToSumSq)
    }
  }
}
