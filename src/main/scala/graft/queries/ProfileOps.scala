package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.model.Tables

/** Data-profiling operators: the "look at the data before you train on
  * it" pass every corpus build runs first. Each is a single scan whose
  * aggregate state is tiny — the 100 TB shape is "one pass, partial
  * aggregation everywhere, a few rows out", never a per-row sort or a
  * driver-side summary loop.
  *
  * Reference analog: the assertion screens the reference runs before
  * estimating (reference: queue_time_predictions/estimate_queue.py:
  * 121-133 domain asserts on x_pos/lanes/queue_full) — generalized
  * from "assert then proceed" to "profile then decide".
  */
object ProfileOps {

  /** Histogram bounds for q_hist_tokens: 16 equi-width buckets over
    * [0, 128) tokens. Fixed (not data-derived) bounds keep the bucket
    * function a pure narrow map — a min/max-derived histogram needs an
    * extra pass; a fixed-bound one streams. */
  private val HistLo = 0.0
  private val HistHi = 128.0
  private val HistBuckets = 16

  val all: Seq[QueryDef] = Seq(

    // --- One-pass table profile: row count, per-column null counts,
    // exact distinct cardinalities, min/max, and an exact decimal
    // average — all from ONE scan of lineitem. The two exact DISTINCT
    // aggregates ride Spark's Expand-based multi-distinct rewrite
    // (each row fans out per distinct clause, then partial-aggregates
    // map-side), so the shuffle carries distinct keys, not rows; at
    // 100 TB the cardinality sketch family (q_approx_distinct) is the
    // cheaper screen and this is the exact audit. Timestamps are
    // rendered as text so both engines hash identical bytes.
    QueryDef("q_profile_stats",
      (spark, dir) => Tables.lineitem(spark, dir).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("l_quantity"))).as("qty_nulls"),
        countDistinct(col("l_returnflag")).as("flags_distinct"),
        countDistinct(col("l_partkey")).as("parts_distinct"),
        min(col("l_quantity")).as("qty_min"),
        max(col("l_quantity")).as("qty_max"),
        Exact.decAvg(col("l_extendedprice"), 2).as("price_avg"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
          .as("ship_min"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
          .as("ship_max")),
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) - count(l_quantity) AS BIGINT) AS qty_nulls,
  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS flags_distinct,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_distinct,
  min(l_quantity) AS qty_min,
  max(l_quantity) AS qty_max,
  ${Exact.decAvgSql("l_extendedprice", 2)} AS price_avg,
  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS ship_min,
  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS ship_max
FROM lineitem""")),

    // --- Fixed-bound equi-width histogram of document token counts
    // (width_bucket): bucketing is a narrow map (no pre-pass, no
    // shuffle), the rollup is a partial-aggregated groupBy on ≤18
    // bucket ids. DuckDB has no width_bucket, so the oracle expands
    // the definition — underflow→0, overflow→buckets+1, else
    // 1 + floor((v-lo)/step) — which doubles as a pin of the exact
    // bucket-edge semantics (a token count of exactly 8 lands in
    // bucket 2, not 1).
    QueryDef("q_hist_tokens",
      (spark, dir) => Tables.documents(spark, dir)
        .select(size(split(col("text"), " ")).cast("double").as("ntok"))
        .select(width_bucket(col("ntok"), lit(HistLo), lit(HistHi),
          lit(HistBuckets)).as("bucket"), col("ntok"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("ntok")).cast("bigint").as("min_tokens"),
          max(col("ntok")).cast("bigint").as("max_tokens"))
        .orderBy(col("bucket")),
      Some(s"""WITH t AS (
  SELECT len(string_split(text, ' ')) AS ntok FROM documents)
SELECT CAST(CASE WHEN ntok < ${HistLo.toInt} THEN 0
            WHEN ntok >= ${HistHi.toInt} THEN ${HistBuckets + 1}
            ELSE 1 + (ntok - ${HistLo.toInt})
                 // ${(HistHi - HistLo).toInt / HistBuckets} END
       AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(ntok) AS BIGINT) AS min_tokens,
  CAST(max(ntok) AS BIGINT) AS max_tokens
FROM t GROUP BY 1 ORDER BY bucket""")),
  )
}
