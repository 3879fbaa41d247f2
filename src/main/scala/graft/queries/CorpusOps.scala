package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Corpus-preparation operators for an LLM training-data pipeline:
  * context-window chunking, sequence packing, repetition/quality
  * signals, term redaction, and near-duplicate cluster resolution
  * (connected components).
  *
  * These are the steps BETWEEN near-dup detection (SimOps/TextOps)
  * and the tokenizer: once pairs are known the pipeline must resolve
  * them to clusters and pick one canonical doc per cluster
  * (q_dup_components); survivors are chunked to the context window
  * (q_chunk_docs), packed into fixed-length training sequences
  * (q_pack_sequences), scored for degenerate repetition
  * (q_repetition), and scrubbed of blocklisted terms (q_redact).
  * Generalizes the reference's per-record preprocessing chain
  * (reference: queue_time_predictions/preprocess_image.py:82-107
  * crop/normalize = "shape the record for the model") to
  * corpus-at-a-time set form.
  *
  * Scale notes per operator are on each QueryDef; the common theme is
  * that nothing here is all-pairs or single-partition: chunking and
  * redaction are pure narrow maps, packing partitions by a shard key,
  * and component resolution is Pregel-style min-label propagation
  * whose per-round shuffle is bounded by the (already skew-capped)
  * edge list.
  */
object CorpusOps {

  /** Training context chunking: width 120 chars, stride 80 (40-char
    * overlap so no boundary-straddling span is ever unseen). */
  private val ChunkWidth = 120
  private val ChunkStride = 80

  /** Packed-sequence length in whitespace tokens. */
  private val PackLen = 512

  /** Blocklist for q_redact (word-boundary regex, identical RE2/Java
    * semantics on both engines). */
  private val RedactPat = "\\b(customer|key|vector|value)\\b"

  val all: Seq[QueryDef] = Seq(

    // --- Context-window chunking with overlap: one output row per
    // (doc, chunk). A pure narrow map — sequence() generates the
    // chunk starts, explode fans out, substr slices — so there is NO
    // shuffle before the output sort: at 100 TB this is a single
    // scan-shaped stage whose output is ~len/stride× the input rows,
    // exactly as parallel as the source files. Chunk boundaries are
    // deterministic byte offsets, so re-runs are idempotent and a
    // chunk is addressable as (doc_id, chunk_idx).
    QueryDef("q_chunk_docs",
      (spark, dir) => Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), length(col("text")) - 1,
            lit(ChunkStride))).as("start"))
        .select(col("doc_id"),
          (col("start") / lit(ChunkStride)).cast("bigint").as("chunk_idx"),
          col("start").cast("bigint").as("start"),
          col("text").substr(col("start") + 1, lit(ChunkWidth)).as("chunk"),
          length(col("text").substr(col("start") + 1, lit(ChunkWidth)))
            .as("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some(s"""SELECT doc_id,
  CAST(start // $ChunkStride AS BIGINT) AS chunk_idx,
  CAST(start AS BIGINT) AS start,
  substring(text, start + 1, $ChunkWidth) AS chunk,
  CAST(length(substring(text, start + 1, $ChunkWidth)) AS INT) AS chunk_len
FROM (SELECT doc_id, text,
        unnest(generate_series(0, length(text) - 1, $ChunkStride)) AS start
      FROM documents)
ORDER BY doc_id, chunk_idx""")),

    // --- Sequence packing (concat-and-split): deterministically order
    // docs within a shard (lang), run a cumulative token count, and
    // chop the concatenated stream into fixed $PackLen-token training
    // sequences. Each doc learns which pack it starts in, its offset,
    // and how many packs it spans. The window partitions by the shard
    // key — packing parallelizes per shard exactly like a production
    // packer (one worker per shard; packs are shard-local), so the
    // only shuffle is one hash exchange on lang, never a global sort.
    // SUM over a window is HUGEINT in DuckDB → CAST AS BIGINT
    // (oracle-playbook rule).
    QueryDef("q_pack_sequences",
      (spark, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
          .withColumn("end_tok", sum(col("n_tokens")).over(w))
          .withColumn("start_tok", col("end_tok") - col("n_tokens"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("start_tok"),
            (col("start_tok") / lit(PackLen)).cast("bigint").as("pack_id"),
            (col("start_tok") % lit(PackLen)).cast("bigint").as("pack_offset"),
            (((col("end_tok") - 1) / lit(PackLen)).cast("bigint")
              - (col("start_tok") / lit(PackLen)).cast("bigint") + 1)
              .as("packs_spanned"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
  SELECT doc_id, lang,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_tok
  FROM t)
SELECT doc_id, lang, n_tokens,
  end_tok - n_tokens AS start_tok,
  CAST((end_tok - n_tokens) // $PackLen AS BIGINT) AS pack_id,
  CAST((end_tok - n_tokens) % $PackLen AS BIGINT) AS pack_offset,
  CAST((end_tok - 1) // $PackLen - (end_tok - n_tokens) // $PackLen + 1
       AS BIGINT) AS packs_spanned
FROM c ORDER BY doc_id""")),

    // --- Degenerate-repetition signal (the "most common n-gram
    // share" family of quality filters): per doc, the share of all
    // token bigrams taken by the single most frequent one. Two-phase
    // aggregation — (doc_id, bigram) counts collapse map-side before
    // the shuffle, then a per-doc rollup — so the shuffle carries one
    // row per DISTINCT bigram per doc, not one per token. Docs with
    // <2 tokens have no bigrams and drop out on both sides.
    QueryDef("q_repetition",
      (spark, dir) => {
        val t = split(col("text"), " ")
        // size>=2 guard: sequence(1, 0) would be a DESCENDING range
        // (same footgun TextOps.shingles documents).
        val bigrams = when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => concat_ws(" ", slice(t, i, lit(2)))))
          .otherwise(array().cast("array<string>"))
        Tables.documents(spark, dir)
          .select(col("doc_id"), explode(bigrams).as("bg"))
          .groupBy(col("doc_id"), col("bg"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("distinct_bigrams"),
            sum(col("n")).as("n_bigrams"),
            max(col("n")).as("top_bigram_n"))
          .select(col("doc_id"), col("distinct_bigrams"), col("n_bigrams"),
            col("top_bigram_n"),
            (col("top_bigram_n").cast("double")
              / col("n_bigrams").cast("double")).as("top_share"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
    i -> tk[i] || ' ' || tk[i + 1])) AS bg
  FROM t WHERE len(tk) >= 2),
c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS distinct_bigrams,
  CAST(sum(n) AS BIGINT) AS n_bigrams,
  CAST(max(n) AS BIGINT) AS top_bigram_n,
  CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top_share
FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // --- Blocklist term redaction (the PII-scrub shape: replace every
    // match, count what was replaced). Word-boundary regex so partial
    // tokens survive; the output carries a digest of the redacted
    // text, not the text, so the operator also demonstrates the
    // "verify a transform by fingerprint" audit pattern. Narrow map,
    // no shuffle; regexp_replace/regexp_count stay inside whole-stage
    // codegen.
    QueryDef("q_redact",
      (spark, dir) => {
        val red = regexp_replace(col("text"), RedactPat, "<term>")
        Tables.documents(spark, dir).select(
          col("doc_id"),
          regexp_count(col("text"), lit(RedactPat)).as("n_redacted"),
          md5(red).as("redacted_md5"),
          length(red).as("redacted_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\\b(customer|key|vector|value)\\b'))
       AS INT) AS n_redacted,
  md5(regexp_replace(text, '\\b(customer|key|vector|value)\\b', '<term>', 'g'))
    AS redacted_md5,
  CAST(length(regexp_replace(text, '\\b(customer|key|vector|value)\\b',
       '<term>', 'g')) AS INT) AS redacted_len
FROM documents ORDER BY doc_id""")),

    // --- Near-dup cluster resolution: connected components over the
    // capped levenshtein pair graph (SimOps.levPairs), via Pregel-
    // style min-label propagation — every doc converges to the
    // minimum doc_id reachable through near-dup edges, which is the
    // cluster's canonical representative (the step that turns PAIRS
    // into KEEP/DROP decisions in a real dedup pipeline). Each round
    // is one bounded shuffle: edges join labels on the target id,
    // min-aggregate per source, merge. Rounds = graph diameter (the
    // driver loop only counts changed labels — no row data ever
    // reaches the driver), and localCheckpoint caps lineage growth
    // per round, so 100 TB cost is O(diameter) joins on an edge list
    // the jumbo-block guard already bounded. The oracle computes the
    // same fixpoint exactly with a recursive CTE — both sides are the
    // unique minimum-label fixpoint, independent of iteration order.
    QueryDef("q_dup_components",
      (spark, dir) => {
        val pairs = SimOps.levPairs(spark, dir).select(col("a_id"), col("b_id"))
        val edges = pairs.union(pairs.select(col("b_id"), col("a_id")))
          .toDF("s", "t").localCheckpoint()
        var labels = Tables.documents(spark, dir)
          .select(col("doc_id").as("id"), col("doc_id").as("comp"))
          .localCheckpoint()
        var changed = 1L
        while (changed > 0) {
          val nbrMin = edges.join(labels, edges("t") === labels("id"))
            .groupBy(col("s")).agg(min(col("comp")).as("nbr_min"))
          val next = labels.join(nbrMin, labels("id") === nbrMin("s"), "left")
            .select(labels("id").as("id"),
              least(col("comp"), coalesce(col("nbr_min"), col("comp")))
                .as("comp"),
              col("comp").as("prev"))
            .localCheckpoint()
          changed = next.filter(col("comp") < col("prev")).count()
          labels = next.select(col("id"), col("comp"))
        }
        val w = Window.partitionBy(col("component"))
        labels.select(col("id").as("doc_id"), col("comp").as("component"))
          .withColumn("component_size", count(lit(1)).over(w))
          .withColumn("is_canonical",
            (col("doc_id") === col("component")).cast("int"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $LevPairsCte,
edges AS (
  SELECT a_id AS s, b_id AS t FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT re.id, e.t FROM reach re JOIN edges e ON e.s = re.r),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
lab AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
SELECT doc_id, CAST(component AS BIGINT) AS component,
  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS component_size,
  CAST(CASE WHEN doc_id = component THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM lab ORDER BY doc_id""")),
  )

  /** [[SimOps.LevPairsSql]], re-exposed for the recursive-CTE splice. */
  private def LevPairsCte: String = SimOps.LevPairsSql
}
