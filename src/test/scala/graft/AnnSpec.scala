package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.ml.Ann
import graft.model.Tables

/** IVF ANN correctness: the probe-cell scan must be EXACT within the
  * cells it probes (approximation comes only from cell selection). */
class AnnSpec extends SparkSpec {

  test("IVF top-k == brute-force top-k restricted to the probed cells") {
    val ivf = Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.length === 5)
    // candidates' cosines are sorted descending and deterministic
    assert(ivf.map(_._2).sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
    val again = Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.sameElements(again), "fixed seed ⇒ deterministic")
  }

  test("IVF results are a subset of brute-force cosine ranking order") {
    // every IVF hit must appear in the exhaustive ranking with the
    // same cosine value (the re-rank is exact)
    val emb = Tables.embeddings(spark, Sf0001)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb"))
    val brute = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5).collect()
    for (r <- ivf)
      assert(brute(r.getLong(0)) === r.getDouble(2), s"vec ${r.getLong(0)}")
  }
}
