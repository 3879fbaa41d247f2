package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Round-10 corpus-curation wave: the composite rule-based document
  * quality gate (the C4/Gopher-rules shape) and a regex PII scan with
  * redaction accounting.
  *
  * Both are pure narrow maps over the documents scan followed by one
  * small rollup — the shape that matters at 100 TB is "no shuffle
  * before the verdict": every rule evaluates per-row from the text
  * column alone. All rule arithmetic is integer (counts and
  * cross-multiplied ratio bounds — `3·wc ≤ chars` instead of
  * `chars/wc ≥ 3.0`), so the gate is bit-identical cross-engine.
  */
object CurateOps {

  private def toks(c: Column): Column = split(c, " ")

  val all: Seq[QueryDef] = Seq(

    // --- COMPOSITE QUALITY GATE (the Gopher/C4 rule family: Rae et
    // al. 2021 §A1.1, Raffel et al. 2020 §2.2): word-count bounds,
    // mean-word-length bounds, stopword presence, and a
    // distinct-token repetition screen, each surfaced as its own flag
    // so downstream can audit WHICH rule killed a document (the
    // difference between a filter and a curation pipeline). Ratio
    // rules are cross-multiplied to stay in integer arithmetic:
    // mean word length in [3, 8] ⇔ 3·wc ≤ chars ∧ chars ≤ 8·wc;
    // distinct ratio ≥ 40% ⇔ 10·distinct ≥ 4·wc.
    QueryDef("q_gopher_rules",
      (spark, dir) => {
        val t = toks(col("text"))
        val wc = size(t)
        // single-space-separated corpus: word chars = len - (wc - 1)
        val chars = length(col("text")) - (wc - lit(1))
        val nd = size(array_distinct(t))
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            wc.as("wc"), chars.as("chars"), nd.as("n_distinct"),
            (wc >= 40 && wc <= 80).as("r_wordcount"),
            (lit(3) * wc <= chars && chars <= lit(8) * wc).as("r_meanlen"),
            (array_contains(t, "the") || array_contains(t, "a")).as("r_stopword"),
            (lit(10) * nd >= lit(4) * wc).as("r_distinct"))
          .withColumn("keep",
            col("r_wordcount") && col("r_meanlen") &&
              col("r_stopword") && col("r_distinct"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS INT) AS wc,
    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS INT) AS chars,
    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
    list_contains(string_split(text, ' '), 'the')
      OR list_contains(string_split(text, ' '), 'a') AS r_stopword
  FROM documents)
SELECT doc_id, source, wc, chars, n_distinct,
  wc >= 40 AND wc <= 80 AS r_wordcount,
  3 * wc <= chars AND chars <= 8 * wc AS r_meanlen,
  r_stopword,
  10 * n_distinct >= 4 * wc AS r_distinct,
  (wc >= 40 AND wc <= 80) AND (3 * wc <= chars AND chars <= 8 * wc)
    AND r_stopword AND (10 * n_distinct >= 4 * wc) AS keep
FROM f ORDER BY doc_id""")),

    // --- PII SCAN + REDACTION ACCOUNTING: regex extraction counts
    // per PII class and the redacted-length delta, rolled up per
    // source — the compliance pass every corpus runs before training.
    // The synthetic corpus carries no natural PII, so the scan rides
    // a DETERMINISTICALLY SYNTHESIZED contact suffix (docs ≡ 0 mod 3
    // gain an email + phone derived from doc_id) — the regex
    // machinery, counts, and redaction algebra are the contract; on
    // real data the suffix disappears and the same plan runs. The
    // patterns avoid lookaround/backrefs so Java regex (Spark) and
    // RE2 (DuckDB) agree. Redaction replaces ALL occurrences on both
    // engines (Spark regexp_replace is global; DuckDB needs the 'g'
    // flag). Per-doc work is a narrow map; the rollup is the only
    // shuffle.
    QueryDef("q_pii_scan",
      (spark, dir) => {
        val contact = when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail-"), col("source"), lit(".com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text"))
        val emailPat = "[a-z0-9._-]+@[a-z0-9-]+\\.[a-z]+"
        val phonePat = "[0-9]{3}-[0-9]{4}"
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"), contact.as("c"))
          .select(col("doc_id"), col("source"),
            size(regexp_extract_all(col("c"), lit(emailPat), lit(0))).as("n_email"),
            size(regexp_extract_all(col("c"), lit(phonePat), lit(0))).as("n_phone"),
            (length(col("c")) -
              length(regexp_replace(regexp_replace(col("c"), emailPat, "[PII]"),
                phonePat, "[PII]"))).as("len_delta"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("n_email") > 0 || col("n_phone") > 0, 1L).otherwise(0L))
              .as("n_flagged"),
            sum(col("n_email").cast("long")).as("total_emails"),
            sum(col("n_phone").cast("long")).as("total_phones"),
            sum(col("len_delta").cast("long")).as("total_len_delta"))
          .orderBy(col("source"))
      },
      Some("""WITH c AS (
  SELECT doc_id, source,
    CASE WHEN doc_id % 3 = 0
      THEN text || ' contact user' || doc_id || '@mail-' || source
        || '.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      ELSE text END AS c
  FROM documents),
scan AS (
  SELECT doc_id, source,
    CAST(len(regexp_extract_all(c, '[a-z0-9._-]+@[a-z0-9-]+\.[a-z]+'))
      AS INT) AS n_email,
    CAST(len(regexp_extract_all(c, '[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone,
    CAST(length(c) - length(
      regexp_replace(
        regexp_replace(c, '[a-z0-9._-]+@[a-z0-9-]+\.[a-z]+', '[PII]', 'g'),
        '[0-9]{3}-[0-9]{4}', '[PII]', 'g')) AS INT) AS len_delta
  FROM c)
SELECT source, count(*) AS n_docs,
  CAST(sum(CASE WHEN n_email > 0 OR n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_flagged,
  CAST(sum(n_email) AS BIGINT) AS total_emails,
  CAST(sum(n_phone) AS BIGINT) AS total_phones,
  CAST(sum(len_delta) AS BIGINT) AS total_len_delta
FROM scan GROUP BY source ORDER BY source""")),
  )
}
