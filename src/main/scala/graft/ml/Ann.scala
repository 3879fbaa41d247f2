package graft.ml

import scala.collection.concurrent.TrieMap

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.model.Tables

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer assigns every vector to a cell; a probe scans only its
  * `nprobe` nearest cells and exact cosine re-ranks the candidates.
  *
  * This is the other canonical ANN scale path next to LSH bucketing
  * (SimOps.q_ann_lsh): at 100 TB the cell id is the partition key,
  * the centroid table (k × dim floats) broadcasts everywhere, and a
  * probe touches nprobe/k of the data. Training the quantizer is a
  * bounded-size one-off job; production IVF trains ONCE on a sample,
  * persists the model, and every probe loads it — never refits.
  */
object Ann {

  /** Persisted-quantizer cache: (embeddings dir, k) → loaded model.
    * Models live at a STABLE path under the session's warehouse dir,
    * keyed by (embeddings dir, k) — so a second process (or a second
    * round of the same pipeline) finds the file and loads it without
    * refitting (full S4 parity: the reference loads trained weights
    * from a well-known path, estimate_queue.py:64-69). First use per
    * path fits, saves via MLWriter, and returns the LOADED copy; a
    * pre-existing file is loaded directly — zero refits ever after. */
  private[graft] val quantizers = TrieMap.empty[(String, Int), KMeansModel]

  /** Stable on-disk home of the (dir, k) quantizer: the dir key is an
    * md5 of the absolute input path (filesystem-safe, collision-proof
    * for any real set of inputs). */
  private[graft] def quantizerPath(spark: SparkSession, dir: String, k: Int): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    s"$warehouse/graft-ivf/${key}_k$k"
  }

  private def quantizer(spark: SparkSession, dir: String, k: Int): KMeansModel =
    quantizers.getOrElseUpdate((dir, k), {
      val path = quantizerPath(spark, dir, k)
      // Hadoop FS, not java.nio — the warehouse may be HDFS/S3 on a
      // real cluster, and the load-first check must see it.
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(hp)) {
        val emb = Tables.embeddings(spark, dir)
          .withColumn("features", array_to_vector(col("embedding")))
        new KMeans().setK(k).setSeed(42L)
          .setFeaturesCol("features").setPredictionCol("cell")
          .fit(emb)
          .write.overwrite().save(path)
      }
      KMeansModel.load(path)
    })

  /** Top-k by cosine for probe vec 0, scanning only the nprobe
    * nearest cells of the persisted quantizer. Deterministic for a
    * fixed seed. */
  def ivfTopK(spark: SparkSession, dir: String,
      k: Int = 16, nprobe: Int = 2, topK: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = quantizer(spark, dir, k)
    val assigned = model.transform(emb)

    // nprobe nearest centroids to the probe vector (tiny driver-side
    // argsort over k centroids — the centroid table is model state,
    // not data).
    val probeVec = assigned.filter(col("vec_id") === 0)
      .select(col("features")).head.getAs[org.apache.spark.ml.linalg.Vector](0)
    val cells = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = org.apache.spark.ml.linalg.Vectors.sqdist(c, probeVec)
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1)

    val probe = assigned.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_emb"))
    assigned
      .filter(col("cell").isin(cells.toSeq: _*) && col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("cell"),
        Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topK)
  }

  /** Batched-probe IVF: the first `nProbes` vectors are resolved as a
    * probe TABLE in one distributed pass — zero per-probe driver
    * round-trips (ivfTopK's single `.head` probe fetch does not
    * batch). Shape, stage by stage:
    *
    *  1. cell assignment of the data side via `model.transform` (the
    *     same persisted quantizer, loaded once);
    *  2. per-probe nprobe-nearest cells: the centroid table (k rows
    *     of MODEL STATE, not data) broadcasts onto the probes, exact
    *     squared distance, native GroupTopK heap with k = nprobe —
    *     no window, no global sort;
    *  3. cell-pruned candidate join: probes×cells (nProbes · nprobe
    *     rows) broadcast against the assigned corpus on the cell id,
    *     so a candidate row is scored only when its cell is probed —
    *     at warehouse scale, with the corpus laid out by cell id,
    *     this same equi join partition-prunes the scan;
    *  4. exact cosine re-rank on the native codegen'd kernel, then
    *     per-probe GroupTopK — the shuffle carries ≤ topK rows per
    *     probe per map partition, independent of corpus size.
    */
  def ivfTopKBatch(spark: SparkSession, dir: String,
      k: Int = 16, nprobe: Int = 2, topK: Int = 10,
      nProbes: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = quantizer(spark, dir, k)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))

    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")

    val probes = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"),
        col("embedding").as("probe_emb"))

    // squared L2 between the float probe and the double centroid —
    // interpreted HOF fold is fine here: k × nProbes rows total
    val d2 = aggregate(
      zip_with(col("probe_emb").cast("array<double>"), col("centroid"),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    val probeCells = graft.plans.GroupTopK.topK(
      probes.crossJoin(broadcast(centroids))
        .select(col("probe_id"), col("probe_emb"), col("cell"),
          d2.as("d2")),
      Seq("probe_id"), Seq(("d2", false), ("cell", false)), nprobe)
      .select(col("probe_id"), col("probe_emb"), col("cell"))

    val scored = assigned
      .join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("cell"),
        Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
    graft.plans.GroupTopK.topK(scored, Seq("probe_id"),
      Seq(("cos", true), ("vec_id", false)), topK)
      .select(col("probe_id"), col("vec_id"), col("cell"), col("cos"))
      .orderBy(col("probe_id"), col("cos").desc, col("vec_id"))
  }
}
