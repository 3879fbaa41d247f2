package graft

/** Physical-plan regression guards: the scale-critical plan shapes
  * (broadcasts, partial aggregation, shuffle-free projections, top-k
  * without global sort, codegen on similarity kernels) are asserted
  * so a future refactor cannot silently regress them — the plan IS
  * the 100 TB contract. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001)
      .queryExecution.executedPlan.toString

  test("q_join_broadcast: both dims broadcast, no shuffle join") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_topk: TakeOrderedAndProject, no global Sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q_asof_knot: pure projection — zero joins, zero aggregates") {
    val p = plan("q_asof_knot")
    assert(!p.contains("Join"), p.take(400))
    assert(!p.contains("Aggregate"), p.take(400))
  }

  test("estimate_queue: aggregation upsert with map-side partial phase") {
    val p = plan("estimate_queue")
    // two aggregate phases (partial before the exchange, final after)
    assert("Aggregate".r.findAllIn(p).size >= 2, p.take(600))
    assert(!p.contains("Window"), "upsert must not be a ranking window")
  }

  test("q_scan_project: projection prunes the parquet read schema") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema"), p.take(400))
    // only the 4 selected columns reach the scan
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"), read)
  }

  test("q_filter_compound: predicates push into the scan") {
    val p = plan("q_filter_compound")
    assert(p.contains("PushedFilters: ["), p.take(400))
    assert(p.linesIterator.find(_.contains("PushedFilters"))
      .exists(l => l.contains("IsNotNull") || l.contains("GreaterThan")), p.take(800))
  }

  test("q_cosine_topk: native kernels in the plan, probe broadcast, top-k") {
    val p = plan("q_cosine_topk")
    assert(p.contains("exactdotproduct") && p.contains("exactsumsq"),
      "native expressions must back the cosine: " + p.take(600))
    assert(p.contains("BroadcastExchange"), "probe must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }

  test("q_partitioned_scan: filter becomes a partition filter (scan prunes)") {
    val p = plan("q_partitioned_scan")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_type"),
      "event_type filter must prune partitions, not scan rows: " + p.take(600))
  }

  test("q_wordcount: partial aggregation before the token shuffle") {
    val p = plan("q_wordcount")
    assert(p.contains("Generate explode"), p.take(400))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(600))
  }

  test("q_topk_per_group: partial WindowGroupLimit runs before the shuffle") {
    val p = plan("q_topk_per_group")
    // the rank<=k filter must push a map-side group limit below the
    // exchange, so each task ships at most k rows per group instead of
    // every group's full history — the difference between O(k·groups)
    // and O(rows) shuffle volume at 100 TB.
    val partialIdx = p.indexOf("WindowGroupLimit")
    assert(partialIdx >= 0 && p.contains("Partial"), p.take(1200))
    assert(p.substring(p.indexOf("Exchange hashpartitioning"))
      .contains("WindowGroupLimit"),
      "a Partial WindowGroupLimit must sit below the exchange: " + p.take(1200))
  }

  test("q_sessionize: both windows share one shuffle and one sort") {
    val p = plan("q_sessionize")
    // lag() and the running sum() use the same (user_id; ts, event_id)
    // spec — Catalyst must plan a single hashpartitioning exchange on
    // user_id and a single sort feeding both Window nodes; a second
    // sort or exchange before the final ORDER BY means the specs
    // diverged and the query re-shuffles its whole input at scale.
    val beforeAgg = p.substring(p.indexOf("HashAggregate"))
    assert("Exchange hashpartitioning".r.findAllIn(beforeAgg).size == 1, p.take(1200))
    assert("Sort \\[".r.findAllIn(beforeAgg).size == 1, p.take(1200))
    assert("Window".r.findAllIn(p).size >= 2, p.take(600))
  }

  test("q_subquery_corr: correlated subqueries decorrelate to agg+join") {
    val p = plan("q_subquery_corr")
    // no SubqueryExec / no nested-loop per-row re-execution: Catalyst
    // rewrites both correlated scalar subqueries into grouped
    // aggregates joined back on p_type.
    assert(p.contains("HashAggregate"), p.take(600))
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "decorrelation must not fall back to nested loop: " + p.take(1200))
  }

  test("q_gap_fill: spine, join and fill run in two hash exchanges") {
    val p = plan("q_gap_fill")
    // one exchange per aggregation (per-user bounds, per-(user,day)
    // daily rollup); the generated spine keeps user_id partitioning
    // through Generate and the join, so the forward-fill window adds a
    // local sort but NO third exchange. A refactor that breaks that
    // re-shuffles the whole dense spine.
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p.take(1500))
    assert(p.contains("Window"), p.take(600))
  }

  test("q_moment_stats: power sums partial-aggregate map-side") {
    val p = plan("q_moment_stats")
    // exact decimal power sums must still be two-phase (partial before
    // the event_type exchange) — that mergeability is the whole reason
    // they replace built-in corr()/stddev() for the oracle path.
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(p.contains("Exchange hashpartitioning"), p.take(800))
  }

  test("q_asof_union: fact-fact as-of joins with one shuffle and no join node") {
    val p = plan("q_asof_union")
    // the union-window rendition must not plan an actual join (no
    // expansion, no per-row rescans) and must shuffle exactly once on
    // user_id before the final presentation sort.
    assert(!p.contains("Join"), p.take(800))
    val beforeSort = p.substring(p.indexOf("Window"))
    assert("Exchange hashpartitioning".r.findAllIn(beforeSort).size == 1, p.take(1200))
  }

  test("q_join_hashed: the shuffle_hash hint plans a ShuffledHashJoin") {
    val p = plan("q_join_hashed")
    assert(p.contains("ShuffledHashJoin"),
      "hint must override SMJ selection: " + p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_set_ops_all: multiset ops do not add a distinct pass") {
    val p = plan("q_set_ops_all")
    // EXCEPT ALL / INTERSECT ALL plan with per-row count bookkeeping
    // (Generate replicate_rows over a count aggregate), not a
    // distinct-then-join — one shuffle per side, none extra.
    assert(p.contains("replicaterows"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_ann_ivf_serve: broadcast-only below a partial+final GroupTopK pair") {
    val p = plan("q_ann_ivf_serve")
    // quantizer + probe shortlist broadcast onto the corpus; the only
    // row-level shuffles are the assignment aggregation and the
    // probe_id exchange BETWEEN the partial (map-side heap) and final
    // GroupTopK — never a sort-merge join, never a corpus × probes
    // exchange
    assert(p.contains("GroupTopK"), p.take(800))
    assert("GroupTopK".r.findAllIn(p).size >= 2,
      "expected partial+final GroupTopK pair")
    assert(!p.contains("SortMergeJoin"), p.take(800))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 2, s"cell shortlist and embedding re-join must broadcast: $bhj")
  }

  test("q_roi_paint: single scan, kernel inside whole-stage codegen, no shuffle before the sort") {
    val p = plan("q_roi_paint")
    // the per-image ROI accounting happens inside the PngRoiStats
    // expression — one parquet scan of doc_id only, zero joins, zero
    // aggregates; the only exchange is the output ORDER BY
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("HashAggregate"), p.take(800))
    assert("Exchange".r.findAllIn(p).size === 1, p.take(800))
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      "scan must prune to doc_id only")
  }
}
