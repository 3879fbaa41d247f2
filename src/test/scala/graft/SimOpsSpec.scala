package graft

import org.apache.spark.sql.functions._

import graft.queries.{SimOps, TextOps}

/** Properties of the near-dup / similarity building blocks that have
  * no SQL oracle (hash functions differ per engine). */
class SimOpsSpec extends SparkSpec {

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 0
    (3L, "completely different words nothing shared at all here truly"))

  private lazy val df = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("minhash: identical text ⇒ identical signature; disjoint text ⇒ distinct") {
    val sigs = df
      .select(col("doc_id"),
        SimOps.minhashSig(TextOps.shingles(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) === sigs(1L), "exact duplicates must collide on every band")
    assert(sigs(0L) !== sigs(3L), "disjoint docs must not share a full signature")
  }

  test("minhash component agreement tracks Jaccard (high-J near-dup ≫ disjoint)") {
    // Per-component agreement is Bernoulli(J); a 40-token fixture with
    // one changed middle token has J = 35/41 ≈ 0.85 (E[agree] ≈ 6.8/8),
    // so ≥5 has huge margin — and the hash is deterministic, so the
    // observed count never drifts between runs.
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val disjoint = (1 to 40).map(i => s"other$i").mkString(" ")
    val sigs = Seq((0L, base), (1L, near), (2L, disjoint))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        SimOps.minhashSig(TextOps.shingles(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agreeNear = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    val agreeDisj = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agreeNear >= 5, s"high-J near-dup agreed on only $agreeNear/8")
    assert(agreeDisj <= 1, s"disjoint docs agreed on $agreeDisj/8")
    assert(agreeNear > agreeDisj)
  }

  test("minhash est_jaccard is exact for identical docs") {
    val sig = SimOps.minhashSig(TextOps.shingles(col("text")))
    val matches = df.filter(col("doc_id") === 0)
      .select(aggregate(zip_with(sig, sig, (p, q) => when(p === q, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("m")).head.getInt(0)
    assert(matches === 8)
  }

  test("h64 matches DuckDB's ('0x' || substring(md5(x),1,15))::BIGINT") {
    // duckdb> SELECT ('0x' || substring(md5('hello'),1,15))::BIGINT
    //         → 419982666956583591
    assert(evalOne[Long](graft.functions.OracleHash.h64(lit("hello")))
      === 419982666956583591L)
  }

  test("simhash: identical ⇒ equal; near-dup ⇒ small hamming; disjoint ⇒ large") {
    val t = split(col("text"), " ")
    val sh = df.select(col("doc_id"),
      SimOps.simhashFromHashes(SimOps.tokenHashes(col("text")), size(t))
        .as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(0L) === sh(1L))
    assert(hamming(sh(0L), sh(2L)) <= 24,
      s"near-dup hamming ${hamming(sh(0L), sh(2L))}")
    assert(hamming(sh(0L), sh(3L)) > hamming(sh(0L), sh(2L)),
      "disjoint text should be farther than a near-dup")
  }

  test("lshBucket: equal vectors share a bucket; sign flip moves bucket") {
    val v = array((1 to 8).map(i => lit(0.1f * i)): _*)
    val flipped = array((1 to 8).map(i =>
      lit(if (i == 1) -0.1f else 0.1f * i)): _*)
    assert(evalOne[Int](SimOps.lshBucket(v)) === evalOne[Int](SimOps.lshBucket(v)))
    assert(evalOne[Int](SimOps.lshBucket(v)) !== evalOne[Int](SimOps.lshBucket(flipped)))
  }

  test("ImageCodec: real PNG round-trip recovers every pixel stat") {
    import graft.functions.ImageCodec
    val id = 5L
    val png = ImageCodec.synthPng(id)
    // must be a genuine PNG stream (magic bytes), decoded by ImageIO
    assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val st = ImageCodec.decodeStats(png)
    assert(st != null)
    val (w, h) = (ImageCodec.widthOf(id), ImageCodec.heightOf(id))
    assert(st.getLong(0) === w.toLong && st.getLong(1) === h.toLong)
    assert(st.getLong(2) === 3L, "decoded raster must carry 3 bands")
    // channel sums must match the closed-form pixel formula exactly
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = ImageCodec.rgbOf(id, x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    assert((st.getLong(3), st.getLong(4), st.getLong(5)) === ((sr, sg, sb)))
  }

  test("ImageCodec: NN resize keeps exactly the stride-2 pixels") {
    import graft.functions.ImageCodec
    val id = 11L
    val resized = ImageCodec.resizeNN(ImageCodec.synthPng(id), 2)
    val st = ImageCodec.decodeStats(resized)
    val (w, h) = (ImageCodec.widthOf(id) / 2, ImageCodec.heightOf(id) / 2)
    assert(st.getLong(0) === w.toLong && st.getLong(1) === h.toLong)
    var sr = 0L
    for (y <- 0 until h; x <- 0 until w)
      sr += (ImageCodec.rgbOf(id, 2 * x, 2 * y) >> 16) & 0xff
    assert(st.getLong(3) === sr)
  }

  test("ImageCodec: corrupt bytes and real JPEG both handled") {
    import graft.functions.ImageCodec
    // poison-row tolerance: garbage decodes to SQL NULL, not a throw
    assert(ImageCodec.decodeStats(Array[Byte](1, 2, 3)) == null)
    assert(ImageCodec.decodeStats(Array.empty[Byte]) == null)
    // a real JPEG stream (reference parity: cv2.imdecode reads JPEG)
    // decodes with correct dimensions; values are lossy, so only the
    // geometry is asserted
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ImageCodec.synthPng(7L)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val st = ImageCodec.decodeStats(bos.toByteArray)
    assert(st != null)
    assert(st.getLong(0) === ImageCodec.widthOf(7L).toLong)
    assert(st.getLong(1) === ImageCodec.heightOf(7L).toLong)
  }

  test("q_simhash explode+agg form == fold-based helper form") {
    import graft.model.Tables
    val t = split(col("text"), " ")
    val helper = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), size(t).as("n"),
        SimOps.tokenHashes(col("text")).as("hs"))
      .select(col("doc_id"),
        SimOps.simhashFromHashes(col("hs"), col("n")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val query = SimOps.all.find(_.name == "q_simhash").get.fn(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(query === helper)
  }

  test("tokenShingleHash path: identical text ⇒ identical hash set") {
    val hashed = df
      .withColumn("th", SimOps.tokenHashes(col("text")))
      .select(col("doc_id"),
        SimOps.shingleHashesFromTokenHashes(col("th")).as("shh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(hashed(0L) === hashed(1L))
    assert((hashed(0L) & hashed(3L)).isEmpty, "disjoint docs share no shingle hash")
  }

  test("exact-dup pairs survive the LSH band join (candidates ⊇ exact dups)") {
    // Build the same banding pipeline as q_minhash_neardup over a
    // corpus with a known duplicate pair; the pair must be emitted.
    val sigs = df.select(col("doc_id"),
      SimOps.minhashSig(TextOps.shingles(col("text"))).as("sig"))
    val banded = sigs.select(col("doc_id"), posexplode(col("sig")))
      .toDF("doc_id", "band", "band_key")
    val x = banded.toDF("id_a", "band", "band_key")
    val y = banded.toDF("id_b", "band", "band_key")
    val pairs = x.join(y, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing from $pairs")
  }

  test("q_quantize8: reconstruction error within the half-step bound") {
    // symmetric max-abs int8: |x − q/scale| ≤ 0.5/scale = max_abs/254
    val rows = SparkEntry.queries("q_quantize8")(spark, Sf0001)
      .select(col("max_abs"), col("max_err")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mx, err) = (r.getDouble(0), r.getDouble(1))
      assert(err <= mx / 254.0 * (1 + 1e-9), s"err=$err max_abs=$mx")
    }
  }

  test("q_semdedup plan: blocked equi-join only — no all-pairs operator") {
    val plan = SparkEntry.queries("q_semdedup")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pairing must ride the (cell, bucket) equi-join, never a cartesian")
    // the only nested-loop allowed is the broadcast of the 10-row
    // centroid table onto the corpus scan (the assignment step)
    val nlJoins = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nlJoins <= 1, s"unexpected nested-loop joins: $nlJoins")
  }

  test("q_pq_quantize: codes are 8 decimal digits; error is non-negative") {
    val rows = SparkEntry.queries("q_pq_quantize")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (code, err) = (r.getLong(1), r.getDouble(2))
      assert(code >= 0L && code <= 99999999L,
        s"vec ${r.getLong(0)}: code $code outside 8 digit-coded subspaces")
      assert(err >= 0.0, s"vec ${r.getLong(0)}: negative reconstruction error")
    }
  }

  test("q_ann_adc: per-probe top-10 ordering and candidate-set laws") {
    val rows = SparkEntry.queries("q_ann_adc")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet === Set(0L, 1L, 2L), "three probes")
    byProbe.foreach { case (p, rs) =>
      assert(rs.length <= 10, s"probe $p returned more than k")
      val adcs = rs.map(_.getDouble(2)).toSeq
      assert(adcs === adcs.sorted, s"probe $p not ranked by ADC distance")
      assert(adcs.forall(_ >= 0.0), s"probe $p has a negative distance")
      assert(rs.map(_.getLong(1)).distinct.length === rs.length,
        s"probe $p repeats a candidate")
    }
  }

  test("q_semdedup: per-cell accounting laws and earliest-keeper rule") {
    val rows = SparkEntry.queries("q_semdedup")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (n, drop, keep) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(keep + drop === n, s"cell ${r.get(0)}: kept+dropped ≠ total")
      // the smallest vec_id in every (cell, bucket) block has no
      // earlier neighbor, so a non-empty cell always keeps ≥ 1
      assert(keep >= 1, s"cell ${r.get(0)} kept nothing")
      total += n
    }
    assert(total === graft.model.Tables.embeddings(spark, Sf0001).count(),
      "every vector is assigned to exactly one cell")
  }
}
