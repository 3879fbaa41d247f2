package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.queries.CorpusOps

/** Property + plan-shape tests for the corpus-preparation operators
  * (queries/CorpusOps.scala). The answers are oracle-gated; these pin
  * the invariants the oracle compare can't see — reconstruction,
  * conservation, fixpoint validity — and the scale-relevant plan
  * shapes. */
class CorpusOpsSpec extends SparkSpec {

  private def q(name: String) =
    CorpusOps.all.find(_.name == name).get.fn(spark, Sf0001)

  private def plan(name: String) =
    CorpusOps.all.find(_.name == name).get.fn(spark, Sf0001)
      .queryExecution.executedPlan.toString

  // --- chunking -------------------------------------------------------

  test("q_chunk_docs: stride-trimmed chunks reconstruct every document") {
    // width 120 / stride 80: taking the first 80 chars of each chunk
    // (all of the last) and concatenating in chunk order must yield
    // the original text — i.e. chunks tile the doc with overlap and
    // no gaps.
    // collect_list has no order guarantee — sort the (idx, head) pairs
    val rebuilt = q("q_chunk_docs")
      .groupBy(col("doc_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("chunk_idx"),
          substring(col("chunk"), 1, 80).as("head")))),
        s => s.getField("head"))).as("head_concat"),
        max(col("start") + col("chunk_len")).as("covered"))
    val joined = Tables.documents(spark, Sf0001)
      .join(rebuilt, "doc_id")
      .withColumn("tail_ok", col("covered") >= length(col("text")))
      .withColumn("prefix_ok",
        col("text").startsWith(col("head_concat"))
          || (length(col("head_concat")) >= length(col("text"))
            && col("head_concat").startsWith(col("text"))))
    assert(joined.filter(!col("tail_ok") || !col("prefix_ok")).count() === 0)
  }

  test("q_chunk_docs: chunk count and width bounds") {
    val bad = q("q_chunk_docs")
      .filter(col("chunk_len") > 120 || col("chunk_len") < 1)
    assert(bad.count() === 0)
    // chunk_idx is dense 0..n-1 per doc
    val dense = q("q_chunk_docs").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("chunk_idx")).as("mx"),
        min(col("chunk_idx")).as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(dense.count() === 0)
  }

  test("q_chunk_docs: narrow map — no exchange below the output sort") {
    val p = plan("q_chunk_docs")
    // one range exchange for the final orderBy and nothing else: the
    // generate/project pipeline must not shuffle
    assert("Exchange".r.findAllIn(p).size === 1, p.take(1200))
    assert(!p.contains("HashAggregate"), p.take(1200))
  }

  // --- packing --------------------------------------------------------

  test("q_pack_sequences: token conservation and offset bounds per shard") {
    val out = q("q_pack_sequences").cache()
    try {
      // sum of per-doc tokens == final end position per shard
      val byLang = out.groupBy(col("lang"))
        .agg(sum(col("n_tokens")).as("total"),
          max(col("start_tok") + col("n_tokens")).as("end"))
        .filter(col("total") =!= col("end"))
      assert(byLang.count() === 0)
      assert(out.filter(col("pack_offset") < 0 || col("pack_offset") >= 512)
        .count() === 0)
      // packs_spanned matches the ceiling arithmetic
      val bad = out.filter(col("packs_spanned") <
        (col("n_tokens") + lit(511)) / lit(512) - lit(1))
      assert(bad.count() === 0)
    } finally out.unpersist()
  }

  test("q_pack_sequences: hierarchical prefix sum keys the big window by (lang, bucket)") {
    val p = plan("q_pack_sequences")
    // the full-corpus window must hash-exchange on (lang, bucket) —
    // partitionBy(lang) alone would serialize each ~N/|lang|-row shard
    // onto one task at scale
    val hashEx = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.exists(l => l.contains("lang") && l.contains("bucket")),
      "no (lang, bucket) exchange:\n" + hashEx.mkString("\n"))
    // and the per-bucket offsets come back over a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_pack_sequences: range bucketing fans each shard out past |lang|") {
    // re-derive the bucket assignment (width = max_id div 32 + 1) and
    // check the corpus actually lands in more (lang, bucket) groups
    // than lang groups — i.e. the decomposition buys real parallelism
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang"))
    val width = docs.agg(max(col("doc_id"))).head.getLong(0) / 32 + 1
    val langN = docs.select(col("lang")).distinct().count()
    val groupN = docs.select(col("lang"),
      (col("doc_id") / width).cast("int")).distinct().count()
    assert(groupN > langN, s"only $groupN (lang,bucket) groups vs $langN langs")
  }

  // --- repetition -----------------------------------------------------

  test("q_repetition: bigram accounting ties out against token counts") {
    val rep = q("q_repetition")
    val toks = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    // a doc with t >= 2 tokens has exactly t-1 bigrams
    val bad = rep.join(toks, "doc_id")
      .filter(col("n_bigrams") =!= col("n_tok") - 1)
    assert(bad.count() === 0)
    // share in (0, 1]; max count consistent with distinct count
    assert(rep.filter(col("top_share") <= 0 || col("top_share") > 1)
      .count() === 0)
    assert(rep.filter(col("top_bigram_n") * col("distinct_bigrams")
      < col("n_bigrams")).count() === 0)
  }

  // --- redaction ------------------------------------------------------

  test("q_redact: narrow map — no exchange below the output sort") {
    val p = plan("q_redact")
    // redaction is scan → project → sort: exactly the one range
    // exchange the deterministic output order requires, no shuffle
    assert("Exchange".r.findAllIn(p).size === 1, p.take(1200))
    assert(p.contains("Exchange rangepartitioning"), p.take(1200))
    assert(!p.contains("HashAggregate"), p.take(1200))
  }

  test("q_repetition: both aggregations stay two-phase (map-side partials)") {
    val p = plan("q_repetition")
    // (doc_id, bigram) counts and the per-doc rollup must each run
    // partial+final so the shuffle carries distinct groups, not tokens
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p.take(1500))
  }

  test("q_redact: redacted text carries no blocklisted term") {
    // recompute the redaction and assert the pattern no longer matches
    val pat = "\\b(customer|key|vector|value)\\b"
    val left = Tables.documents(spark, Sf0001).select(col("doc_id"),
      regexp_count(regexp_replace(col("text"), pat, "<term>"), lit(pat))
        .as("left_over"),
      regexp_count(col("text"), lit(pat)).as("n"))
    assert(left.filter(col("left_over") =!= 0).count() === 0)
    // and the corpus actually exercises the operator
    assert(left.filter(col("n") > 0).count() > 0)
  }

  // --- components -----------------------------------------------------

  test("q_dup_components: labels are a valid connected-components fixpoint") {
    val comp = q("q_dup_components").cache()
    try {
      val pairs = graft.queries.SimOps.all.find(_.name == "q_lev_neardup")
        .get.fn(spark, Sf0001).select(col("a_id"), col("b_id"))
      // every edge's endpoints share a component
      val a = comp.select(col("doc_id").as("a_id"), col("component").as("ca"))
      val b = comp.select(col("doc_id").as("b_id"), col("component").as("cb"))
      val split = pairs.join(a, "a_id").join(b, "b_id")
        .filter(col("ca") =!= col("cb"))
      assert(split.count() === 0, "edge endpoints in different components")
      // component label is the minimum doc_id of its member set
      val badMin = comp.groupBy(col("component"))
        .agg(min(col("doc_id")).as("mn"))
        .filter(col("component") =!= col("mn"))
      assert(badMin.count() === 0, "component label must be the member min")
      // exactly one canonical doc per component
      val canon = comp.groupBy(col("component"))
        .agg(sum(col("is_canonical")).as("n_canon"))
        .filter(col("n_canon") =!= 1)
      assert(canon.count() === 0)
      // the near-dup corpus actually produces a multi-doc cluster
      assert(comp.filter(col("component_size") > 1).count() > 0)
    } finally comp.unpersist()
  }

  // --- decontamination ------------------------------------------------

  test("q_decontaminate: covers exactly the train split, flag ties to count") {
    val out = q("q_decontaminate").cache()
    try {
      val train = Tables.documents(spark, Sf0001)
        .filter(col("doc_id") % 10 =!= 0).count()
      assert(out.count() === train, "one row per train doc, eval docs absent")
      assert(out.filter(col("doc_id") % 10 === 0).count() === 0)
      assert(out.filter(col("contaminated") =!=
        (col("n_shared_shingles") > 0).cast("int")).count() === 0)
      // a train doc that is an exact copy of an eval doc must be caught
      val evalTexts = Tables.documents(spark, Sf0001)
        .filter(col("doc_id") % 10 === 0).select(col("text"))
      val copies = Tables.documents(spark, Sf0001)
        .filter(col("doc_id") % 10 =!= 0)
        .join(evalTexts, Seq("text"), "left_semi")
        .filter(length(col("text")) >= 20) // ≥3 tokens → has shingles
        .select(col("doc_id"))
      val missed = copies.join(out.filter(col("contaminated") === 0),
        Seq("doc_id"), "left_semi")
      assert(missed.count() === 0,
        "an exact copy of an eval doc escaped decontamination")
    } finally out.unpersist()
  }

  // --- stratified sample ---------------------------------------------

  test("q_sample_stratified: per-stratum cap respected, deterministic, native top-k plan") {
    val out = q("q_sample_stratified").cache()
    try {
      val perLang = out.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val sizes = Tables.documents(spark, Sf0001)
        .groupBy(col("lang")).agg(count(lit(1)).as("total"))
      val bad = perLang.join(sizes, "lang")
        .filter(col("n") =!= least(lit(60L), col("total")))
      assert(bad.count() === 0, "each stratum keeps min(cap, size) docs")
      val again = q("q_sample_stratified").collect()
      assert(out.collect().sameElements(again), "hash sample is deterministic")
    } finally out.unpersist()
    assert(plan("q_sample_stratified").contains("GroupTopK"),
      "stratified sample must ride the native partial-heap operator")
  }

  // --- domain mix -----------------------------------------------------

  test("q_domain_mix: row count equals the weighted corpus, epochs dense per doc") {
    val out = q("q_domain_mix").cache()
    try {
      val expected = Tables.documents(spark, Sf0001)
        .select(when(col("source") === "src0", lit(3L))
          .when(col("source") === "src1", lit(2L)).otherwise(lit(1L)).as("e"))
        .agg(sum(col("e"))).head.getLong(0)
      assert(out.count() === expected)
      val dense = out.groupBy(col("doc_id"), col("epochs"))
        .agg(count(lit(1)).as("n"), min(col("epoch")).as("mn"),
          max(col("epoch")).as("mx"))
        .filter(col("n") =!= col("epochs") || col("mn") =!= 0
          || col("mx") =!= col("epochs") - 1)
      assert(dense.count() === 0, "epoch must be dense 0..epochs-1 per doc")
    } finally out.unpersist()
  }

  // --- deterministic shuffle ------------------------------------------

  test("q_shuffle_det: shards bounded, positions dense per shard, rows preserved") {
    val out = q("q_shuffle_det").cache()
    try {
      assert(out.count() ===
        Tables.documents(spark, Sf0001).count(), "a shuffle loses nothing")
      assert(out.filter(col("shard") < 0 || col("shard") >= 64).count() === 0)
      val dense = out.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), min(col("pos_in_shard")).as("mn"),
          max(col("pos_in_shard")).as("mx"))
        .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
      assert(dense.count() === 0, "pos_in_shard must be dense 1..n per shard")
      // the per-shard window must key its exchange on the shard — the
      // whole point is never sorting the corpus on one task
      val p = plan("q_shuffle_det")
      assert(p.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("shard")),
        p.take(1200))
    } finally out.unpersist()
  }

  test("q_dedup_span: accounting ties out; kept spans = distinct span hashes") {
    val out = q("q_dedup_span").cache()
    try {
      // per-row accounting
      assert(out.filter(col("n_kept") + col("n_dropped") =!= col("n_spans"))
        .count() === 0)
      // globally, every distinct span has exactly ONE kept owner
      val kept = out.agg(sum(col("n_kept"))).collect()(0).getLong(0)
      val tk = split(col("text"), " ")
      val distinctSpans = Tables.documents(spark, Sf0001)
        .select(explode(transform(
          sequence(lit(0), ((size(tk) - lit(1)) / lit(10)).cast("int")),
          i => concat_ws(" ", slice(tk, i * lit(10) + lit(1), lit(10)))))
          .as("span"))
        .select(graft.functions.OracleHash.h64(col("span")).as("h"))
        .distinct().count()
      assert(kept === distinctSpans, s"kept=$kept distinct=$distinctSpans")
    } finally out.unpersist()
  }

  test("q_dedup_span_apply agrees with q_dedup_span on kept counts") {
    val stats = q("q_dedup_span").select(col("doc_id"), col("n_kept"))
    val applied = q("q_dedup_span_apply")
      .select(col("doc_id"), col("n_kept").as("n_kept_applied"))
    val disagree = stats.join(applied, Seq("doc_id"))
      .filter(col("n_kept") =!= col("n_kept_applied")).count()
    assert(disagree === 0)
  }

  test("q_scd2: intervals conserve events and adjacent segments differ") {
    // q_scd2 lives in Analytic.all — reach it via the entry map
    val out = SparkEntry.queries("q_scd2")(spark, Sf0001).cache()
    try {
      val nEvents = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
      assert(nEvents === Tables.events(spark, Sf0001).count())
      // a segment boundary exists ONLY at a type change
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("seg"))
      val sameAsPrev = out
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type") === col("event_type"))
      assert(sameAsPrev.count() === 0, "adjacent segments share event_type")
    } finally out.unpersist()
  }

  test("q_dedup_keep_best: one keeper per component, and it has max quality") {
    val out = q("q_dedup_keep_best").cache()
    try {
      val perComp = out.groupBy(col("component"))
        .agg(sum(col("keep")).as("n_keep"),
          max(col("quality")).as("q_max"),
          max(when(col("keep") === 1, col("quality"))).as("q_kept"))
      assert(perComp.filter(col("n_keep") =!= 1).count() === 0)
      assert(perComp.filter(col("q_kept") =!= col("q_max")).count() === 0)
    } finally out.unpersist()
  }

  test("q_sample_temperature: keep rate is antitone in domain share (flattening)") {
    val rows = q("q_sample_temperature")
      .select(col("share"), col("p_keep"), col("n_docs"), col("n_kept"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((share, p, n, kept) <- rows) {
      assert(p > 0.0 && p <= 1.0, s"p_keep=$p")
      assert(kept <= n, s"kept=$kept n=$n")
      assert(share > 0.0)
    }
    // temperature < 1 flattens: a rarer domain never keeps a SMALLER
    // fraction than a more dominant one (p ∝ 1/sqrt(share), capped)
    for ((s1, p1, _, _) <- rows; (s2, p2, _, _) <- rows if s1 < s2)
      assert(p1 >= p2, s"share $s1 (p=$p1) vs share $s2 (p=$p2)")
  }

  test("connectedComponents: pointer jumping — a 64-node path converges in ≤10 rounds") {
    // worst case for plain min-label propagation is a path graph
    // (rounds = diameter = 63); pointer jumping needs ~log₂(63)+1 ≈ 7
    // rounds, so maxRounds = 10 passing IS the O(log d) law
    import spark.implicits._
    val nodes = (0L until 64L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("s", "t")
    val comp = CorpusOps.connectedComponents(nodes, edges, maxRounds = 10)
    assert(comp.filter(col("comp") =!= 0L).count() === 0,
      "every node of a path must label to the minimum id")
  }

  test("connectedComponents: fails fast when maxRounds is exceeded") {
    import spark.implicits._
    val nodes = (0L until 16L).toDF("id")
    val edges = (0L until 15L).map(i => (i, i + 1)).toDF("s", "t")
    assertThrows[IllegalStateException] {
      CorpusOps.connectedComponents(nodes, edges, maxRounds = 1)
    }
  }
}
