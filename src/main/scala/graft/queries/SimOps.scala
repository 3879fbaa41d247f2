package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.model.Tables

/** Similarity search + near-duplicate detection + multimodal columns
  * over the `embeddings` feature vectors and `documents` corpus.
  *
  * Generalizes the reference's 58,368-dim VGG16 feature vector
  * (reference: queue_time_predictions/preprocess_image.py:176-195) to
  * the LLM-pipeline operators a 100 TB training-data build needs:
  * brute-force cosine top-k as the correctness baseline, sign-bit LSH
  * bucketing as the scale path (probe only touches its own bucket —
  * the scan prunes to ~1/2^bits of the data), MinHash/LSH banding for
  * near-dup candidate generation (all-pairs is O(N²) and never runs;
  * band collisions emit the only pairs ever compared), SimHash
  * fingerprints, and binary multimodal payloads carried through joins
  * with a clearly-marked deterministic stub decode (the real JPEG
  * decode of preprocess_image.py:36-54 needs an image library this
  * container doesn't ship; the Spark-side plumbing — schema, join,
  * digesting — is real).
  */
object SimOps {

  /** Sign-bit LSH bucket over the first `bits` vector components
    * (random-hyperplane LSH with axis-aligned planes — deterministic
    * and oracle-expressible; a production variant draws dense Gaussian
    * planes, same operator shape). */
  def lshBucket(e: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(e, i + 1) > lit(0.0), lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  def lshBucketSql(e: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"(CASE WHEN ($e)[${i + 1}] > 0.0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** MinHash signature: for each of `k` hash families, the minimum
    * xxhash64 over the document's shingle set. */
  def minhashSig(sh: Column, k: Int = 8): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))

  /** 64-bit SimHash from per-token hashes: per bit, the majority vote
    * over tokens of that hash bit (±1), folded into a single long. */
  def simhashFromHashes(hs: Column, nTokens: Column): Column =
    (0 until 64).map { b =>
      val ones = aggregate(hs, lit(0),
        (acc, h) => acc + when(
          shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L), lit(1))
          .otherwise(lit(0)))
      when(ones * 2 > nTokens, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  val all: Seq[QueryDef] = Seq(

    // --- Brute-force cosine top-k against a probe vector: the
    // correctness baseline for ANN. The 1-row probe is broadcast; the
    // scan side stays un-shuffled; top-k plans as TakeOrderedAndProject
    // (per-partition heaps, no global sort).
    QueryDef("q_cosine_topk",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
        val probe = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("probe_emb"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .select(col("vec_id"),
            Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0)
SELECT vec_id, ${Exact.cosineFSql("embedding", "probe_emb")} AS cos
FROM embeddings, probe WHERE vec_id <> 0
ORDER BY cos DESC, vec_id LIMIT 10""")),

    // --- LSH-bucketed ANN: the scale path. Both sides bucket by sign
    // bits; the probe joins only its own bucket (expected candidate
    // set = N / 2^bits), then exact cosine re-ranks. At 100 TB the
    // bucket column is the partition key and the probe scan prunes to
    // one partition.
    QueryDef("q_ann_lsh",
      (spark, dir) => {
        val emb = Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"),
            lshBucket(col("embedding")).as("bucket"))
        val probe = emb.filter(col("vec_id") === 0)
          .select(col("bucket").as("p_bucket"), col("embedding").as("probe_emb"))
        emb.filter(col("vec_id") =!= 0)
          .join(broadcast(probe), col("bucket") === col("p_bucket"))
          .select(col("vec_id"), col("bucket"),
            Exact.cosineF(col("embedding"), col("probe_emb")).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH b AS (
  SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket FROM embeddings),
probe AS (SELECT bucket AS p_bucket, embedding AS probe_emb FROM b WHERE vec_id = 0)
SELECT vec_id, bucket, ${Exact.cosineFSql("embedding", "probe_emb")} AS cos
FROM b, probe WHERE vec_id <> 0 AND bucket = p_bucket
ORDER BY cos DESC, vec_id LIMIT 10""")),

    // --- MinHash + LSH banding near-dup candidates. Shingle →
    // 8-family minhash signature → band per hash (r=1: collision
    // probability per band = Jaccard, right for this low-similarity
    // synthetic corpus; production pretraining dedup uses r=4+,
    // b=16+ to target j≈0.6+) → equi-join on (band, key) emits
    // candidate pairs; signature agreement estimates Jaccard.
    // xxhash64 has no DuckDB twin → no SQL oracle; the scalatest
    // suite pins the semantics (identical text ⇒ identical signature;
    // candidates ⊇ exact duplicates).
    QueryDef("q_minhash_neardup",
      (spark, dir) => {
        val k = 8
        val sigs = Tables.documents(spark, dir)
          .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
          .filter(size(col("sh")) > 0)
          .select(col("doc_id"), minhashSig(col("sh"), k).as("sig"))
        val banded = sigs.select(col("doc_id"), col("sig"),
          posexplode(col("sig")))
          .select(col("doc_id"), col("sig"),
            col("pos").as("band"), col("col").as("band_key"))
        val x = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
          col("band"), col("band_key"))
        val y = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
          col("band"), col("band_key"))
        x.join(y, Seq("band", "band_key"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("n_shared_bands"),
            first(aggregate(zip_with(col("sig_a"), col("sig_b"),
              (p, q) => when(p === q, 1).otherwise(0)),
              lit(0), (acc, v) => acc + v)).as("n_sig_match"))
          .withColumn("est_jaccard", col("n_sig_match").cast("double") / lit(k.toDouble))
          .select(col("id_a"), col("id_b"), col("n_shared_bands"), col("est_jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      },
      None),

    // --- SimHash fingerprint: 64-bit locality-sensitive digest of the
    // token stream (near-identical docs differ in few bits; hamming
    // distance over bit_count(a XOR b) finds near-dups without pair
    // enumeration). Token hashes computed once per row; 64 per-bit
    // majority folds stay native HigherOrderFunction expressions.
    QueryDef("q_simhash",
      (spark, dir) => {
        val t = split(col("text"), " ")
        val withHashes = Tables.documents(spark, dir)
          .select(col("doc_id"), size(t).as("n_tokens"),
            transform(t, tk => xxhash64(tk)).as("hs"))
        withHashes
          .select(col("doc_id"),
            simhashFromHashes(col("hs"), col("n_tokens")).as("simhash"))
          .withColumn("popcount", bit_count(col("simhash")))
          .orderBy(col("doc_id"))
      },
      None),

    // --- Multimodal payloads through a join: documents gain a binary
    // payload + typed metadata struct, join embeddings on id, output
    // scalar digests (md5 of the bytes, decimal-exact vector norm).
    // The binary column flows through the shuffle like any other —
    // this is the S2 image-bytes shape (preprocess_image.py:36-54)
    // with parquet BinaryType standing in for S3 JPEGs.
    QueryDef("q_multimodal_join",
      (spark, dir) => {
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
            encode(col("text"), "UTF-8").as("payload"))
          .withColumn("meta", struct(lit("text/plain").as("mime"),
            length(col("payload")).as("n_bytes")))
        docs.join(Tables.embeddings(spark, dir),
          col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("lang"),
            col("meta.mime").as("mime"),
            col("meta.n_bytes").as("n_bytes"),
            md5(col("payload")).as("payload_md5"),
            col("label"),
            Exact.sumSq(col("embedding")).as("emb_sumsq"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang,
  'text/plain' AS mime,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  md5(text) AS payload_md5,
  label,
  ${Exact.sumSqSql("embedding")} AS emb_sumsq
FROM documents JOIN embeddings ON doc_id = vec_id
ORDER BY doc_id""")),

    // --- STUB image/media decode + feature extraction. The real
    // operator decodes JPEG/audio bytes (reference S2/P4,
    // preprocess_image.py:36-54, :176-195); the decode libraries are
    // not in this container, so the decode is a clearly-marked
    // deterministic fake over the payload digest. The Spark-side
    // plumbing — binary column in, typed feature struct + vector out,
    // pure projection, no shuffle — is the real operator shape.
    QueryDef("q_multimodal_decode",
      (spark, dir) => {
        val payload = encode(col("text"), "UTF-8")
        // STUB: dimensions/features derived from the bytes' digest
        // (deterministic fake standing in for cv2.imdecode + model).
        val h = crc32(payload)
        val fakeFeatures = transform(sequence(lit(1), lit(8)),
          i => (pmod(xxhash64(payload, i), lit(1000L))).cast("double") / lit(1000.0))
        Tables.documents(spark, dir)
          .select(col("doc_id"),
            length(payload).as("n_bytes"),
            (pmod(h, lit(640L)) + lit(1)).cast("int").as("width"),
            (pmod(h, lit(480L)) + lit(1)).cast("int").as("height"),
            lit(3).as("n_channels"),
            fakeFeatures.as("features"))
          .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
            col("n_channels"),
            Exact.decSumArr(col("features")).as("feat_digest"))
          .orderBy(col("doc_id"))
      },
      None),
  )
}
