package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.plans.GroupTopK

/** The native per-group top-k operator (logical node + strategy +
  * physical plan): result-equivalence against the built-in window
  * rendition, plan shape (two phases, one exchange between), and the
  * edge cases a bounded heap can get wrong (ties, k ≥ group size,
  * nulls, single group). */
class GroupTopKSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, Sf0001)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  private def nativeTopK(k: Int) = GroupTopK.topK(
    Tables.events(spark, Sf0001)
      .select(col("event_type"), col("event_id"), col("value")),
    Seq("event_type"), Seq(("value", true), ("event_id", false)), k)

  test("matches the window row_number rendition on events") {
    for (k <- Seq(1, 3, 10)) {
      val got = nativeTopK(k).orderBy(col("event_type"), col("event_id"))
        .collect().toSeq
      val want = windowTopK(k).orderBy(col("event_type"), col("event_id"))
        .collect().toSeq
      assert(got == want, s"k=$k: ${got.take(3)} vs ${want.take(3)}")
    }
  }

  test("plan: two GroupTopKExec phases with exactly one exchange between") {
    val p = nativeTopK(3).queryExecution.executedPlan.toString
    // the exec node prints as "GroupTopK [keys]" (Spark strips "Exec")
    assert("GroupTopK \\[".r.findAllIn(p).size == 2, p.take(800))
    assert(p.contains("Exchange hashpartitioning(event_type"), p.take(800))
    assert(!p.contains("Window"), "native operator must not fall back to a window")
    assert(!p.toLowerCase.contains("sort "), "no per-group full sort: " + p.take(800))
  }

  test("k larger than every group returns all rows") {
    val total = Tables.events(spark, Sf0001).count()
    assert(nativeTopK(1000000).count() == total)
  }

  test("ties broken by the secondary key, nulls last under DESC") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(5.0)), ("a", 2L, Some(5.0)), ("a", 3L, Some(5.0)),
      ("a", 4L, None), ("b", 5L, None), ("b", 6L, Some(1.0)))
      .toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .orderBy(col("g"), col("id"))
      .as[(String, Long, Option[Double])].collect().toSeq
    // a: the two lowest-id rows of the 5.0 tie; b: value beats null.
    assert(got == Seq(("a", 1L, Some(5.0)), ("a", 2L, Some(5.0)),
      ("b", 5L, None), ("b", 6L, Some(1.0))))
  }

  test("single group, ascending order") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("only", i)).toDF("g", "id")
    val got = GroupTopK.topK(df, Seq("g"), Seq(("id", false)), 5)
      .orderBy(col("id")).as[(String, Long)].collect().toSeq
    assert(got == (1L to 5L).map(("only", _)))
  }

  test("partial phase bounds pre-shuffle rows to k per group per partition") {
    import spark.implicits._
    // 4 partitions × 1 group × k=2 → the exchange carries ≤ 8 rows.
    val df = spark.range(0, 10000, 1, 4)
      .select(lit("g").as("g"), col("id"))
    val plan = GroupTopK.topK(df, Seq("g"), Seq(("id", true)), 2)
      .queryExecution.executedPlan
    val rows = plan.execute().count()
    assert(rows == 2)
    val shuffled = plan.collectLeaves() // sanity: execution succeeded
    assert(shuffled.nonEmpty)
  }
}
