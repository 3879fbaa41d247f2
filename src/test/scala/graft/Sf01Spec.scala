package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** 10x-SF magnitude gate (tagged slow — exclude with
  * `sbt "testOnly -- -l graft.SlowSf01"`).
  *
  * The driver's correctness gate runs at sf0.01; a real magnitude-
  * dependent parity bug (decimal→double 1-ulp divergence once a sum
  * crosses 53 significant bits — fixed by Exact.decSum's
  * decimal→text→double route) only surfaced at sf0.1. DuckDB isn't
  * linkable from the JVM, so the cross-engine half of the 10x check
  * lives in tools/verify_local.py; THIS spec covers the half that is
  * checkable in-process at sf0.1 for the newest oracle pairs:
  *
  *  1. the query executes at 10x the gate SF without ANSI/overflow
  *     errors (magnitude-dependent failures throw, not drift);
  *  2. the result signature is IDENTICAL under 4-way and 13-way
  *     shuffle partitioning — every aggregate fold must be
  *     association-order-free, which is precisely the property that
  *     1000-executor runs need and single-partition toy runs never
  *     test.
  */
object SlowSf01 extends Tag("graft.SlowSf01")

class Sf01Spec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.1"

  /** Queries touched or added in the current round — keep this list
    * fresh each round (the newest pairs are the likeliest to hide a
    * magnitude bug). */
  private val newest = Seq(
    // round 14 wave: MOR DML ladder, WAP branches, history table,
    // streaming MOR MERGE
    "q_merge_mor", "q_wap_publish", "q_table_history",
    "q_stream_merge_mor",
    // round 13 wave: index-as-table serving, adaptive skew, CDF,
    // incremental MinHash
    "q_ann_index_serve", "q_join_skew_aqe", "q_stream_cdf",
    "q_minhash_incremental", "q_update_sql", "q_merge_sql",
    "q_delete_mor", "q_stream_cdf_mor", "q_clustered_write",
    // round 12 vision/warehouse wave (+ the events-storage-drift
    // recovery: these exercise the re-normalized ts read path)
    "q_decode_jpeg", "q_roi_mask", "q_roi_paint", "q_ann_ivf_serve",
    "q_delete_cow", "q_restore", "q_try_expr", "q_stream_late_audit",
    "q_lateral_topk", "q_observe_metrics", "q_manifest_strprune",
    "q_null_semantics", "q_dedup_incremental", "q_bm25_mrr",
    "q_window_median", "q_binary_ann", "q_binary_rerank",
    // round 10 OLAP/curation wave
    "q_star_join", "q_global_rank", "q_winsorize", "q_hist_equidepth",
    "q_session_window", "q_gopher_rules", "q_pii_scan",
    // round 10 second wave
    "q_pit_join", "q_bellman_ford", "q_stream_manifest_source",
    "q_stream_medallion", "q_sql_catalog",
    // round 10 earlier additions
    "q_cms_hh", "q_geo_join", "q_url_parse", "q_dq_checks", "q_ewma",
    "q_gini", "q_inverted_index", "q_label_prop", "q_kcore",
    // round 9 late additions first judged this round
    "q_ks_stat", "q_transition_matrix", "q_shortest_path",
    "q_manifest_bloom", "q_recursive_cte",
    // prior-round carries worth keeping at 10x
    "q_pagerank", "q_triangles", "q_anomaly_sigma", "q_mv_maintain",
    "q_semdedup", "q_assoc_rules")

  /** Order-independent distributed result signature: per-row xxhash64
    * over the stringified row, bit_xor-folded (commutative and
    * ANSI-overflow-free, unlike a long sum). No driver-side collect. */
  private def signature(df: DataFrame): (Long, Long) = {
    val h = df.select(xxhash64(
      df.columns.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)
      .as("h"))
    val r = h.agg(expr("bit_xor(h)").as("s"), count(lit(1)).as("n")).head()
    (r.getLong(0), r.getLong(1))
  }

  for (name <- newest)
    test(s"$name at sf0.1: runs clean, partition-count invariant", SlowSf01) {
      val s4 = spark.newSession()
      s4.conf.set("spark.sql.shuffle.partitions", "4")
      val s13 = spark.newSession()
      s13.conf.set("spark.sql.shuffle.partitions", "13")
      val a = signature(SparkEntry.queries(name)(s4, Sf01))
      val b = signature(SparkEntry.queries(name)(s13, Sf01))
      assert(a._2 > 0, s"$name returned no rows at sf0.1")
      assert(a === b,
        s"$name signature differs across partitionings: $a vs $b")
    }
}
