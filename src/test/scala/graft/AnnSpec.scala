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

  test("IVF quantizer is trained once, persisted, and reused across calls") {
    Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5).collect()
    val m1 = Ann.quantizers.get((Sf0001, 8)).orNull
    assert(m1 != null, "first call must populate the persisted-quantizer cache")
    Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5).collect()
    assert(Ann.quantizers((Sf0001, 8)) eq m1,
      "second call must reuse the loaded model — no per-call refit")
  }

  test("IVF recall: all cells probed == exact top-k; partial probe bounded") {
    val emb = Tables.embeddings(spark, Sf0001)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb"))
    val exact = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    // nprobe = k scans every cell → the IVF answer IS the exact answer
    val full = Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 8, topK = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(full === exact, s"full probe must equal brute force: $full vs $exact")
    // partial probe trades recall for 2/8 of the scan; it must still
    // surface a nontrivial share of the true top-k
    val part = Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5)
      .collect().map(_.getLong(0)).toSet
    val recall = part.intersect(exact.toSet).size / exact.size.toDouble
    assert(recall >= 0.2, s"recall@5 = $recall")
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

  test("batched IVF, all cells probed == per-probe brute-force top-k") {
    val emb = Tables.embeddings(spark, Sf0001)
    val probes = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val exact = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("probe_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // nprobe = k probes every cell → batch IVF must BE brute force
    val batch = Ann.ivfTopKBatch(spark, Sf0001,
      k = 8, nprobe = 8, topK = 5, nProbes = 4).collect()
    assert(batch.length === 4 * 5)
    for ((probeRows, p) <- batch.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map(x => (x._2.sortBy(-_.getDouble(3)), x._1));
        (r, i) <- probeRows.zipWithIndex)
      assert(r.getLong(1) === exact((p, i + 1)),
        s"probe $p rank ${i + 1}: ${r.getLong(1)} vs ${exact((p, i + 1))}")
  }

  test("batched IVF agrees with single-probe ivfTopK for probe 0") {
    val single = Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val batch = Ann.ivfTopKBatch(spark, Sf0001,
      k = 8, nprobe = 2, topK = 5, nProbes = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    assert(batch === single,
      s"batch probe-0 must equal the single-probe path: $batch vs $single")
  }

  test("fresh cache + existing persisted file ⇒ quantizer loads without fitting") {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val path = Ann.quantizerPath(spark, Sf0001, 8)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // plant a model a refit could never produce (k = 3, not 8) at
      // the stable (dir, k = 8) home, then drop the in-memory cache —
      // the next call must come back with the planted model
      val emb = Tables.embeddings(spark, Sf0001)
        .withColumn("features", array_to_vector(col("embedding")))
      new KMeans().setK(3).setSeed(1L).setFeaturesCol("features")
        .setPredictionCol("cell").fit(emb)
        .write.overwrite().save(path)
      Ann.quantizers.remove((Sf0001, 8))
      Ann.ivfTopK(spark, Sf0001, k = 8, nprobe = 2, topK = 5).collect()
      assert(Ann.quantizers((Sf0001, 8)).clusterCenters.length === 3,
        "a pre-existing persisted quantizer must be loaded, not refit")
    } finally {
      fs.delete(hp, true)
      Ann.quantizers.remove((Sf0001, 8))
    }
  }
}
