package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Edge cases of the text building blocks that the corpus (long docs
  * only) never exercises. */
class TextOpsSpec extends SparkSpec {

  private def shinglesOf(text: String): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextOps.shingles(col("text")).as("sh"))
      .head.getSeq[String](0)
  }

  test("shingles: short docs yield empty sets, 3 tokens yield one shingle") {
    assert(shinglesOf("one") === Seq.empty)
    assert(shinglesOf("one two") === Seq.empty)
    assert(shinglesOf("one two three") === Seq("one two three"))
    assert(shinglesOf("a b c d") === Seq("a b c", "b c d"))
  }

  test("shingles deduplicate repeats") {
    assert(shinglesOf("a b a b a b") === Seq("a b a", "b a b"))
  }

  test("q_lang_id guesses stay in the closed language domain") {
    val guesses = TextOps.all.find(_.name == "q_lang_id").get
      .fn(spark, Sf0001)
      .select(col("guess")).distinct()
      .collect().map(_.getString(0)).toSet
    val domain = TextOps.LangMarkers.map(_._1).toSet + "und"
    assert(guesses.subsetOf(domain), guesses)
  }

  test("q_quality_score stays in [0,1] and scores every doc") {
    val rows = TextOps.all.find(_.name == "q_quality_score").get
      .fn(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val q = r.getDouble(r.fieldIndex("quality"))
      assert(q >= 0.0 && q <= 1.0, s"doc ${r.getLong(0)} quality $q")
    }
  }
}
