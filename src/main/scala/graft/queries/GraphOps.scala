package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.util.Pin.PinOps

/** Iterative graph analytics over the supplier↔customer interaction
  * graph (who supplied whom, derived from lineitem ⋈ orders — the
  * graph a procurement-analytics user of the reference would build
  * from the same fact data). Companion to the pointer-jumping
  * connected components in [[CorpusOps]]: components prove O(log d)
  * convergence; PageRank is the fixed-iteration-count shape.
  *
  * EXACT INTEGER PAGERANK: ranks live on a 1e-6 fixed-point BIGINT
  * grid and every update is integer arithmetic —
  * `next(v) = 150000 + Σ_{u→v} (rank(u)·17) div (outdeg(u)·20)`
  * (damping 0.85 = 17/20 as an exact rational; `div` truncates, and
  * all operands are positive, so Spark's `div` and DuckDB's `//`
  * agree). A floating-point PageRank can NEVER be a cross-engine or
  * cross-partitioning contract — the sum's merge order changes the
  * low bits every run; on the integer grid the fold is associative
  * and the oracle can replay all K iterations as chained CTEs,
  * bit-for-bit.
  *
  * Scale shape: the edge set (with out-degrees attached) is built
  * once and pinned ([[graft.util.Pin]]: localCheckpoint by default,
  * reliable checkpoint(dir) under `graft.checkpoint.dir` for cluster
  * fault tolerance) — K iterations reuse the materialized edges
  * instead of re-deriving the join lineage K times. Each
  * iteration is one broadcast of the current rank vector onto the
  * edge scan + one aggregation keyed by destination (map-side
  * combine): the EDGES — the 100 TB side — never re-shuffle. When the
  * node vector outgrows broadcast range, the same loop runs as a
  * co-partitioned shuffle join on node id (both sides hash-partition
  * the same key every iteration, so AQE reuses the exchange); the
  * node table is |V| ≪ |E| — the standard Pregel-style layout.
  * Node ids disambiguate the two key spaces arithmetically
  * (supplier → 2k, customer → 2k+1): no string concat in the hot
  * keys. Every node has in- and out-edges by construction (edges go
  * both directions), so no dangling-mass term is needed and the
  * grouped update covers every node each round.
  */
object GraphOps {

  val Iterations = 5

  /** BFS rounds for q_shortest_path (covers the bipartite graph's
    * small diameter; unreached nodes simply don't appear). */
  val Hops = 4

  /** Synchronous label-propagation rounds for q_label_prop. */
  val LpaRounds = 3

  /** k-core threshold + peel rounds for q_kcore. */
  val KcoreK = 8
  val KcoreRounds = 3

  /** Node degrees of an undirected (u, v) edge set. */
  private[graft] def degreesOf(e: DataFrame): DataFrame =
    e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

  /** Degree-ordered edge orientation (Suri & Vassilvitskii): each
    * undirected edge points from its lower-(degree, id) endpoint to
    * the higher. The O(|V|) degree table joins onto the edge scan
    * BROADCAST within `graft.triangles.broadcastMaxNodes` (default
    * 2M) and as a partitioned shuffle-hash beyond it — a forced
    * broadcast at 100× the node count is an OOM, not a plan. Both
    * strategies (and the flip) are pinned hash-equal in ScaleSpec;
    * factored out of q_triangles so the pin can see this subtree's
    * plan (inside the query it hides behind a localCheckpoint). */
  private[graft] def orientEdges(spark: org.apache.spark.sql.SparkSession,
      e: DataFrame, deg: DataFrame): DataFrame = {
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val maxBroadcastNodes = spark.conf
      .getOption("graft.triangles.broadcastMaxNodes")
      .map(_.toLong).getOrElse(2000000L)
    // node count ≤ 2·|E| (every node appears on an edge), and the
    // threshold is an order-of-magnitude OOM guard — so the bound
    // reads the (pinned) edge set's cheap count instead of paying an
    // extra aggregation job for the exact degree-table cardinality
    val degBroadcasts = 2L * e.count() <= maxBroadcastNodes
    def degSide(d: DataFrame): DataFrame =
      if (degBroadcasts) broadcast(d) else d.hint("shuffle_hash")
    e.join(degSide(deg.select(col("n").as("u"), col("d").as("du"))), "u")
      .join(degSide(deg.select(col("n").as("v"), col("d").as("dv"))), "v")
      .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef("q_pagerank",
      (spark, dir) => {
        // materialize the distinct pair set once: the two union
        // branches, the degree table, and the edge join would each
        // re-run the fact join otherwise (measured 1.5× the whole
        // query at sf0.1)
        val pairs = Tables.lineitem(spark, dir)
          .select(col("l_suppkey"), col("l_orderkey"))
          .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2).as("s"),
            (col("o_custkey") * 2 + 1).as("c"))
          .distinct()
          .pinned()
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .unionAll(pairs.select(col("c").as("src"), col("s").as("dst")))
        val deg = edges.groupBy(col("src"))
          .agg(count(lit(1)).as("outdeg"))
        // materialize once; 5 iterations re-scan these edges.
        // r21 audit of the OTHER fan direction (r20 measured widening
        // iterative pins as a loss, 13.98 → 17.30 s family-wide):
        // narrowing — count-derived coalesce of the pinned edge blocks
        // (500k rows/task, capped at default parallelism) ahead of the
        // loop — measured 2.38 → 3.01 s isolated and was REVERTED too:
        // the iteration scan stages are already ≤ 8 cheap tasks (AQE
        // coalescing), so the added count job + serialized scans only
        // cost. The pin's natural post-AQE width stands.
        val ed = edges.join(deg, "src").pinned()

        var ranks = deg.select(col("src").as("node"),
          lit(1000000L).as("pr"))
        // thresholded strategy for the per-iteration rank join (same
        // flip as the triangle closure): the rank table is O(|V|) —
        // within graft.pagerank.broadcastMaxNodes (default 2M) it
        // broadcasts (edges never shuffle across iterations); beyond
        // it a FORCED broadcast is an OOM, not a plan, so the join
        // falls back to a partitioned shuffle-hash with ranks as the
        // build side. Both strategies pinned hash-equal in ScaleSpec.
        // The bound reads the pinned edge set's cheap cached count
        // once before the loop (nodes ≤ edges here — every node has
        // an out-edge), never an extra aggregation job, never per
        // iteration.
        val maxBroadcastNodes = spark.conf
          .getOption("graft.pagerank.broadcastMaxNodes")
          .map(_.toLong).getOrElse(2000000L)
        val rankBroadcasts = ed.count() <= maxBroadcastNodes
        for (_ <- 1 to Iterations) {
          val r = if (rankBroadcasts) broadcast(ranks)
            else ranks.hint("shuffle_hash")
          ranks = ed.join(r, col("src") === col("node"))
            .select(col("dst"),
              expr("(pr * 17) div (outdeg * 20)").as("contrib"))
            .groupBy(col("dst"))
            .agg((lit(150000L) + sum(col("contrib"))).as("pr"))
            .select(col("dst").as("node"), col("pr"))
        }
        ranks.orderBy(col("pr").desc, col("node")).limit(20)
      },
      Some {
        val base = """WITH pairs AS (
  SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.outdeg
  FROM edges e JOIN deg d ON d.src = e.src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg)"""
        val iters = (1 to Iterations).map { i =>
          s"""r$i AS (
  SELECT ed.dst AS node,
    CAST(150000 + sum((r.pr * 17) // (ed.outdeg * 20)) AS BIGINT) AS pr
  FROM ed JOIN r${i - 1} r ON r.node = ed.src
  GROUP BY ed.dst)"""
        }.mkString(",\n")
        s"""$base,
$iters
SELECT node, pr FROM r$Iterations
ORDER BY pr DESC, node LIMIT 20"""
      }),

    // --- TRIANGLE COUNTING on the part co-purchase graph (parts
    // sharing an order), by DEGREE-ORDERED EDGE ORIENTATION (Suri &
    // Vassilvitskii, WWW'11): each undirected edge points from its
    // lower-(degree, id) endpoint to the higher, making the graph
    // acyclic with per-node out-degree O(√E) — so the wedge join
    // (e1.dst = e2.src) materializes Σ outdeg² = O(E^1.5) candidate
    // paths instead of the Σ deg² a naive neighbor join produces,
    // which a single celebrity node would blow up quadratically. The
    // wedge→edge closure is a plain hash join on the (src, dst) pair;
    // nothing in the pipeline is ever collected or windowed globally.
    // The degree table is |V| rows — broadcast onto the edge scan.
    // Output: graph profile + wedge/triangle counts (all BIGINT; the
    // wedge count is orientation-determined, so it's a contract, not
    // an implementation detail).
    QueryDef("q_triangles",
      (spark, dir) => {
        val items = Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        // shuffle-hash: both sides already hash-partition on ok; an
        // SMJ would pay two sorts of the item table for nothing
        val e = items.as("a").join(items.as("b").hint("shuffle_hash"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
          .distinct()
          .pinned() // degree table + orientation + closure all re-scan it
        val deg = degreesOf(e)
        val o = orientEdges(spark, e, deg).pinned()
        // closure check in ONE pass over the wedge stream, with an
        // edge-count-thresholded strategy (config
        // graft.triangles.broadcastMaxEdges, default 2M):
        //  - within range the edge set BROADCASTS, packed into a
        //    single long (part ids < 2³¹) so the build is a
        //    LongHashedRelation and every probe is one long-key
        //    lookup instead of a two-column row comparison (measured
        //    4.6× on this stage) — the O(E^1.5) wedges never shuffle;
        //  - beyond broadcast range the closure falls back to a
        //    PARTITIONED shuffle-hash join on the same packed key:
        //    the wedges pay one shuffle, the correct trade once the
        //    edge set outgrows executor memory (a forced broadcast
        //    there is an OOM, not a plan). The count that picks the
        //    strategy reads the already-localCheckpoint'd edge set —
        //    cached-block metadata, not a recompute. Both strategies
        //    are pinned hash-equal (and the flip pinned) in ScaleSpec.
        // A left-outer probe counts wedges and closed wedges
        // (= triangles) in the same pass either way.
        val packed = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
          shiftleft(a, 32) + b
        val oPacked = o.select(packed(col("src"), col("dst")).as("k"),
          lit(1L).as("hit"))
        val maxBroadcastEdges = spark.conf
          .getOption("graft.triangles.broadcastMaxEdges")
          .map(_.toLong).getOrElse(2000000L)
        val wedges = o.as("e1").join(o.as("e2").hint("shuffle_hash"),
            col("e1.dst") === col("e2.src"))
          .select(packed(col("e1.src"), col("e2.dst")).as("k"))
        val closed =
          if (o.count() <= maxBroadcastEdges)
            wedges.join(broadcast(oPacked), Seq("k"), "left_outer")
          else
            wedges.join(oPacked.hint("shuffle_hash"), Seq("k"), "left_outer")
        val wt = closed
          .agg(count(lit(1)).as("n_wedges"), count(col("hit")).as("n_triangles"))
        val profile = e.agg(count(lit(1)).as("n_edges"))
          .crossJoin(deg.agg(count(lit(1)).as("n_nodes"), max(col("d")).as("max_deg")))
          .crossJoin(o.groupBy(col("src")).agg(count(lit(1)).as("od"))
            .agg(max(col("od")).as("max_outdeg")))
        profile.crossJoin(wt)
          .select(col("n_nodes"), col("n_edges"), col("max_deg"),
            col("max_outdeg"), col("n_wedges"), col("n_triangles"))
      },
      Some("""WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) GROUP BY n),
o AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
           THEN e.u ELSE e.v END AS src,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
           THEN e.v ELSE e.u END AS dst
  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
w AS (SELECT e1.src AS a, e2.dst AS c FROM o e1 JOIN o e2 ON e1.dst = e2.src)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
  (SELECT max(d) FROM deg) AS max_deg,
  (SELECT CAST(max(od) AS BIGINT) FROM (
    SELECT count(*) AS od FROM o GROUP BY src)) AS max_outdeg,
  (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
  (SELECT CAST(count(*) AS BIGINT)
     FROM w JOIN o ON o.src = w.a AND o.dst = w.c) AS n_triangles""")),

    // --- MULTI-SOURCE BFS (landmark hop distance): unweighted
    // shortest-path distance from a seed set (every 50th supplier)
    // over the supplier↔customer graph, the reachability/blast-radius
    // primitive. FRONTIER-DRIVEN: each round joins only the
    // NEWLY-discovered nodes against the edge list (edges are built
    // once and localCheckpoint'd; every round's join hash-partitions
    // on the same key, so AQE reuses the exchange), and an anti-join
    // against the distance table keeps the frontier monotonically
    // shrinking once the graph saturates — per-round work is
    // O(edges incident to the frontier), never O(V·E). Unweighted BFS
    // makes frontier-only relaxation exact: a node's first discovery
    // round IS its distance, which is why the oracle's
    // full-relaxation chained CTEs (min over all paths ≤ k hops)
    // produce the identical table. Hops=4 covers the bipartite
    // graph's small diameter; the output is the per-distance profile,
    // not the node table, so the contract is scale-independent.
    QueryDef("q_shortest_path",
      (spark, dir) => {
        val pairs = Tables.lineitem(spark, dir)
          .select(col("l_suppkey"), col("l_orderkey"))
          .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2).as("s"),
            (col("o_custkey") * 2 + 1).as("c"))
          .distinct()
          .pinned()
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .unionAll(pairs.select(col("c").as("src"), col("s").as("dst")))
          .pinned()
        var dist = pairs.select(col("s").as("node")).distinct()
          .filter(expr("(node div 2) % 50 = 1"))
          .select(col("node"), lit(0L).as("d"))
          .pinned()
        var frontier = dist.select(col("node"))
        for (i <- 1 to Hops) {
          val discovered = edges
            .join(frontier, col("src") === col("node"))
            .select(col("dst").as("node")).distinct()
            .join(dist, Seq("node"), "left_anti")
            .pinned()
          dist = dist
            .unionAll(discovered.select(col("node"), lit(i.toLong).as("d")))
            .pinned()
          frontier = discovered
        }
        dist.groupBy(col("d"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("node")).as("min_node"), max(col("node")).as("max_node"))
          .orderBy(col("d"))
      },
      Some {
        val base = """WITH pairs AS (
  SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
d0 AS (
  SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS d
  FROM pairs WHERE (s // 2) % 50 = 1)"""
        val iters = (1 to Hops).map { i =>
          s"""d$i AS (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM d${i - 1}
    UNION ALL
    SELECT e.dst AS node, p.d + 1 AS d
    FROM edges e JOIN d${i - 1} p ON e.src = p.node) t
  GROUP BY node)"""
        }.mkString(",\n")
        s"""$base,
$iters
SELECT d, CAST(count(*) AS BIGINT) AS n_nodes,
  min(node) AS min_node, max(node) AS max_node
FROM d$Hops GROUP BY d ORDER BY d"""
      }),

    // --- WEIGHTED SSSP (Bellman-Ford, fixed K rounds): min-plus
    // relaxation over integer edge weights — the weighted companion
    // to q_shortest_path's unweighted BFS. Weighted relaxation CANNOT
    // ride a shrinking frontier (a later, longer path may still be
    // cheaper), so every round relaxes the FULL distance table against
    // the materialized edge list: dist_i(v) = min(dist_{i-1}(v),
    // min_{u→v}(dist_{i-1}(u) + w)) — one co-partitioned join + one
    // min-aggregate per round, O(E) each, the textbook distributed
    // Bellman-Ford cost. Weights are h64-derived integers in [1, 9]
    // (both engines build the identical graph); K rounds means
    // "cheapest path using ≤ K hops" — stated, deterministic, and
    // replayable as chained CTEs, which is exactly what the oracle
    // does. Output is the per-distance profile, scale-independent.
    QueryDef("q_bellman_ford",
      (spark, dir) => {
        val pairs = Tables.lineitem(spark, dir)
          .select(col("l_suppkey"), col("l_orderkey"))
          .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2).as("s"),
            (col("o_custkey") * 2 + 1).as("c"))
          .distinct()
          .pinned()
        val weight = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
          pmod(graft.functions.OracleHash.h64(
            concat(lit("w:"), a, lit(":"), b)), lit(9L)) + 1
        val edges = pairs
          .select(col("s").as("src"), col("c").as("dst"),
            weight(col("s"), col("c")).as("w"))
          .unionAll(pairs.select(col("c").as("src"), col("s").as("dst"),
            weight(col("s"), col("c")).as("w")))
          .pinned()
        var dist = pairs.select(col("s").as("node")).distinct()
          .filter(expr("(node div 2) % 50 = 1"))
          .select(col("node"), lit(0L).as("d"))
        for (_ <- 1 to Hops) {
          dist = dist.unionAll(
            edges.join(dist, col("src") === col("node"))
              .select(col("dst").as("node"), (col("d") + col("w")).as("d")))
            .groupBy(col("node")).agg(min(col("d")).as("d"))
            .pinned()
        }
        dist.groupBy(col("d"))
          .agg(count(lit(1)).as("n_nodes"),
            min(col("node")).as("min_node"), max(col("node")).as("max_node"))
          .orderBy(col("d"))
      },
      Some {
        val base = s"""WITH pairs AS (
  SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT s AS src, c AS dst,
    ${graft.functions.OracleHash.h64Sql("'w:' || s || ':' || c")} % 9 + 1 AS w
  FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst,
    ${graft.functions.OracleHash.h64Sql("'w:' || s || ':' || c")} % 9 + 1 AS w
  FROM pairs),
d0 AS (
  SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS d
  FROM pairs WHERE (s // 2) % 50 = 1)"""
        val iters = (1 to Hops).map { i =>
          s"""d$i AS (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM d${i - 1}
    UNION ALL
    SELECT e.dst AS node, p.d + e.w AS d
    FROM edges e JOIN d${i - 1} p ON e.src = p.node) t
  GROUP BY node)"""
        }.mkString(",\n")
        s"""$base,
$iters
SELECT d, CAST(count(*) AS BIGINT) AS n_nodes,
  min(node) AS min_node, max(node) AS max_node
FROM d$Hops GROUP BY d ORDER BY d"""
      }),

    // --- LABEL PROPAGATION community detection (Raghavan et al.
    // 2007), synchronous, LpaRounds rounds, on the STRONG
    // supplier↔customer graph (pairs with ≥2 distinct shared orders —
    // thresholding is itself the standard densification step; the
    // full bipartite graph is so dense LPA collapses to one giant
    // community). Each round every node takes its neighbors'
    // MAJORITY label; naive LPA is nondeterministic at ties, so the
    // argmax is the PACKED integer max(cnt·2³² + (2³²−1 − label)) —
    // highest count, then LOWEST label, one aggregate, no window,
    // bit-identical on both engines. Per round: one broadcast of the
    // |V|-sized label vector onto the materialized edge scan + one
    // two-phase agg — the PageRank layout; the edges never
    // re-shuffle. Synchronous + fixed rounds keeps the whole
    // trajectory replayable as chained CTEs (the oracle runs all
    // rounds bit-for-bit).
    QueryDef("q_label_prop",
      (spark, dir) => {
        val pairs = Tables.lineitem(spark, dir)
          .select(col("l_suppkey"), col("l_orderkey"))
          .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy((col("l_suppkey") * 2).as("s"),
            (col("o_custkey") * 2 + 1).as("c"))
          .agg(countDistinct(col("l_orderkey")).as("cnt"))
          .filter(col("cnt") >= 2)
          .select(col("s"), col("c"))
          .pinned()
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .unionAll(pairs.select(col("c").as("src"), col("s").as("dst")))
          .pinned()
        var lbl = edges.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("label"))
        for (_ <- 1 to LpaRounds) {
          lbl = edges.join(broadcast(lbl), col("src") === col("node"))
            .groupBy(col("dst"), col("label"))
            .agg(count(lit(1)).as("cnt"))
            .groupBy(col("dst"))
            .agg(expr("4294967295 - (max(cnt * 4294967296 + " +
              "(4294967295 - label)) % 4294967296)").as("label"))
            .select(col("dst").as("node"), col("label"))
        }
        lbl.groupBy(col("label").as("community"))
          .agg(count(lit(1)).as("n_members"),
            min(col("node")).as("min_node"), max(col("node")).as("max_node"))
          .orderBy(col("n_members").desc, col("community"))
          .limit(20)
      },
      Some {
        val base = """WITH pairs AS (
  SELECT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING count(DISTINCT l_orderkey) >= 2),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
        val iters = (1 to LpaRounds).map { i =>
          s"""l$i AS (
  SELECT dst AS node,
    4294967295 - (max(cnt * 4294967296 + (4294967295 - label))
                  % 4294967296) AS label
  FROM (
    SELECT e.dst, l.label, CAST(count(*) AS BIGINT) AS cnt
    FROM edges e JOIN l${i - 1} l ON l.node = e.src
    GROUP BY e.dst, l.label) t
  GROUP BY dst)"""
        }.mkString(",\n")
        s"""$base,
$iters
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members,
  min(node) AS min_node, max(node) AS max_node
FROM l$LpaRounds GROUP BY label
ORDER BY n_members DESC, community LIMIT 20"""
      }),

    // --- K-CORE DECOMPOSITION (iterative peeling): repeatedly drop
    // nodes of degree < k until fixpoint — the graph-hygiene pass
    // that strips barely-connected noise before community/centrality
    // work. Runs on the same strong graph as q_label_prop with
    // k = KcoreK, KcoreRounds peel rounds; the CONTRACT is the whole
    // per-round (nodes, edges) trajectory, so convergence (rounds
    // that change nothing re-emit the same counts) is itself gated.
    // Per round: one degree aggregation (|V| rows, broadcast back)
    // and one semi-join of the shrinking edge set against survivors —
    // work is O(current edges) and monotonically non-increasing, the
    // property that makes peeling viable at 100 TB. Directed-edge
    // counts are halved for the undirected contract (always even by
    // construction).
    QueryDef("q_kcore",
      (spark, dir) => {
        val pairs = Tables.lineitem(spark, dir)
          .select(col("l_suppkey"), col("l_orderkey"))
          .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy((col("l_suppkey") * 2).as("s"),
            (col("o_custkey") * 2 + 1).as("c"))
          .agg(countDistinct(col("l_orderkey")).as("cnt"))
          .filter(col("cnt") >= 2)
          .select(col("s"), col("c"))
        var e = pairs.select(col("s").as("src"), col("c").as("dst"))
          .unionAll(pairs.select(col("c").as("src"), col("s").as("dst")))
          .pinned()
        val stats = Seq.newBuilder[org.apache.spark.sql.DataFrame]
        val profile = (round: Int, df: org.apache.spark.sql.DataFrame) =>
          df.agg(countDistinct(col("src")).as("n_nodes"),
              expr("count(1) div 2").as("n_edges"))
            .select(lit(round).as("round"), col("n_nodes"), col("n_edges"))
        stats += profile(0, e)
        for (i <- 1 to KcoreRounds) {
          val keep = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
            .filter(col("d") >= KcoreK).select(col("src").as("n"))
          e = e.join(broadcast(keep), col("src") === col("n"), "left_semi")
            .join(broadcast(keep), col("dst") === col("n"), "left_semi")
            .pinned()
          stats += profile(i, e)
        }
        stats.result().reduce(_ unionAll _).orderBy(col("round"))
      },
      Some {
        val base = """WITH pairs AS (
  SELECT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2 HAVING count(DISTINCT l_orderkey) >= 2),
e0 AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs)"""
        val iters = (1 to KcoreRounds).map { i =>
          s"""k$i AS (
  SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= $KcoreK),
e$i AS (
  SELECT e.src, e.dst FROM e${i - 1} e
  JOIN k$i a ON a.src = e.src
  JOIN k$i b ON b.src = e.dst)"""
        }.mkString(",\n")
        val stats = (0 to KcoreRounds).map { i =>
          s"""SELECT $i AS round, CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
  CAST(count(*) // 2 AS BIGINT) AS n_edges FROM e$i"""
        }.mkString("\nUNION ALL\n")
        s"""$base,
$iters
$stats ORDER BY round"""
      }),
  )
}
