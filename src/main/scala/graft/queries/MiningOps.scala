package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.OracleHash
import graft.model.Tables

/** Data-mining operators the reference's downstream consumers run on
  * any engine once the ETL lands (reference: estimate_queue.py emits
  * a keyed estimate feed; profiling/validating/summarizing that feed
  * is the consumer side): a count-min-sketch heavy-hitter pass, a
  * grid-bucketed spatial near join, URL decomposition for crawl-style
  * corpus curation, and a data-quality expectation suite.
  *
  * Exactness doctrine: every sketch hash is [[OracleHash.h64]] (the
  * md5-derived 60-bit value both engines compute bit-for-bit), every
  * count is BIGINT, every division is integral on positive operands
  * (Spark `div` == DuckDB `//`) — so even the APPROXIMATE operators
  * are deterministic contracts, not tolerance tests.
  */
object MiningOps {

  /** Count-min sketch geometry: depth (independent hash rows) ×
    * width (buckets per row). Width is a power of two so the modulo
    * is a cheap mask at scale; 4×2048 cells = 64 KiB of BIGINTs —
    * broadcastable no matter how large the keyed stream is. */
  val CmsDepth = 4
  val CmsWidth = 2048

  /** Heavy-hitter threshold divisor: a key is "heavy" when its count
    * is ≥ total/1000 (the φ=0.1% heavy-hitter definition). */
  val HhDivisor = 1000

  /** Spatial grid cell size (== the query radius, so a 3×3 cell
    * neighborhood covers every candidate pair). */
  val GeoCell = 10000L

  val all: Seq[QueryDef] = Seq(

    // --- COUNT-MIN SKETCH heavy hitters (Cormode & Muthukrishnan
    // 2005): the streaming-frequency primitive every training-data
    // pipeline runs to find dominating keys (hot domains, spammy
    // users, over-represented sources) WITHOUT per-key state. The
    // sketch is CmsDepth×CmsWidth cells — each input row increments
    // one cell per hash row, built here as ONE two-phase aggregation
    // whose shuffle carries at most D·W = 8192 cells regardless of
    // input size. Estimates (min over the D cells a key hashes to)
    // are ≥ the true count (no deletions), so `est ≥ T` yields a
    // NO-FALSE-NEGATIVE candidate set: every true heavy hitter is in
    // the output, and `is_true_hh` marks the false positives that an
    // exact second pass over the candidate set (bounded, broadcast-
    // joinable) would prune. Every hash is h64, every count BIGINT —
    // the sketch content is a cross-engine contract, not an estimate
    // band.
    // The keyed stream is SKEWED BY CONSTRUCTION (70% of rows collapse
    // onto 19 hot keys, the rest keep their customer key): a uniform
    // key column has no φ-heavy hitters at all once the row count
    // outgrows the key cardinality gap — at sf0.1 the candidate set
    // came back empty and the operator demonstrated nothing. The CASE
    // is integer arithmetic, so both engines build the identical
    // stream at every SF, and hot keys sit at ~3.7% ≫ φ=0.1% while
    // the tail stays sub-threshold (surviving tail keys are exactly
    // the CMS false positives `is_true_hh` flags).
    QueryDef("q_cms_hh",
      (spark, dir) => {
        // fan the one-task single-file scan out before the D-way hash
        // fan-out + partial count (guide §2.5); the exchange carries
        // one bigint per row. All three consumers (cells, keys, tot)
        // reuse the same exchange output.
        val base = graft.util.Par.fanOut(Tables.orders(spark, dir).select(
          when(col("o_custkey") % 10 < 7, col("o_custkey") % 19)
            .otherwise(col("o_custkey")).as("k")))
        val js = spark.range(CmsDepth.toLong).select(col("id").cast("int").as("j"))
        val bucket = (j: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =>
          pmod(OracleHash.h64(concat(j, lit(":"), k)), lit(CmsWidth))
        // sketch build: row stream × D hash rows → (row, bucket) cells
        val cells = base.crossJoin(broadcast(js))
          .select(col("j"), bucket(col("j"), col("k")).as("b"))
          .groupBy(col("j"), col("b"))
          .agg(count(lit(1)).as("c"))
        // query side: the distinct key set probed against the sketch
        val keys = base.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
        val tot = base.agg(count(lit(1)).as("n"))
        keys.crossJoin(broadcast(js))
          .select(col("k"), col("exact_cnt"), col("j"),
            bucket(col("j"), col("k")).as("b"))
          .join(broadcast(cells), Seq("j", "b"))
          .groupBy(col("k"), col("exact_cnt"))
          .agg(min(col("c")).as("cms_est"))
          .crossJoin(broadcast(tot))
          .filter(col("cms_est") >= expr(s"n div $HhDivisor"))
          .select(col("k").as("key"), col("exact_cnt"), col("cms_est"),
            (col("cms_est") - col("exact_cnt")).as("overcount"),
            (col("exact_cnt") >= expr(s"n div $HhDivisor")).as("is_true_hh"))
          .orderBy(col("exact_cnt").desc, col("key"))
      },
      Some(s"""WITH base AS (
  SELECT CASE WHEN o_custkey % 10 < 7 THEN o_custkey % 19
         ELSE o_custkey END AS k FROM orders),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
js AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(j)),
cells AS (
  SELECT j, ${OracleHash.h64Sql("j || ':' || k")} % $CmsWidth AS b,
    CAST(count(*) AS BIGINT) AS c
  FROM base CROSS JOIN js GROUP BY 1, 2),
keys AS (SELECT k, CAST(count(*) AS BIGINT) AS exact_cnt FROM base GROUP BY 1),
est AS (
  SELECT keys.k, keys.exact_cnt, min(cells.c) AS cms_est
  FROM keys CROSS JOIN js
  JOIN cells ON cells.j = js.j
    AND cells.b = ${OracleHash.h64Sql("js.j || ':' || keys.k")} % $CmsWidth
  GROUP BY 1, 2)
SELECT k AS key, exact_cnt, cms_est, cms_est - exact_cnt AS overcount,
  exact_cnt >= (SELECT n FROM tot) // $HhDivisor AS is_true_hh
FROM est WHERE cms_est >= (SELECT n FROM tot) // $HhDivisor
ORDER BY exact_cnt DESC, key""")),

    // --- GRID-BUCKETED SPATIAL NEAR JOIN: all point pairs within
    // Chebyshev distance r, the blocked self-join every spatial /
    // embedding-2D workload needs. Points land in r×r grid cells;
    // one side joins its own cell, the other side is exploded to its
    // 3×3 cell neighborhood (9 rows), so every qualifying pair meets
    // in exactly the probe cell of its anchor — an EQUI-join on the
    // packed cell id that partitions cleanly at any scale, never a
    // cartesian product (ScaleSpec pins the plan). Per-cell occupancy
    // bounds the worst case exactly like LSH bucket caps do for the
    // near-dup family. Coordinates are h64-derived integers, so both
    // engines build the identical point set.
    QueryDef("q_geo_join",
      (spark, dir) => {
        val pts = Tables.customer(spark, dir).select(
          col("c_custkey").as("id"),
          pmod(OracleHash.h64(concat(lit("gx:"), col("c_custkey"))),
            lit(1000000L)).as("x"),
          pmod(OracleHash.h64(concat(lit("gy:"), col("c_custkey"))),
            lit(1000000L)).as("y"))
        val cells = pts.select(col("id"), col("x"), col("y"),
          expr(s"x div $GeoCell").as("cx"), expr(s"y div $GeoCell").as("cy"))
        val offsets = Seq(-1L, 0L, 1L)
        val probes = cells
          .select(col("id"), col("x"), col("y"), col("cx"), col("cy"),
            explode(array(offsets.map(lit(_)): _*)).as("dx"))
          .select(col("id"), col("x"), col("y"), col("cx"), col("cy"),
            col("dx"), explode(array(offsets.map(lit(_)): _*)).as("dy"))
          .select(col("id"), col("x"), col("y"),
            ((col("cx") + col("dx")) * 1024 + col("cy") + col("dy")).as("cell"))
        val anchors = cells.select(col("id"), col("x"), col("y"),
          (col("cx") * 1024 + col("cy")).as("cell"))
        val cheb = greatest(abs(col("a.x") - col("b.x")),
          abs(col("a.y") - col("b.y")))
        anchors.as("a").join(probes.as("b"),
            col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
          .filter(cheb <= GeoCell)
          .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
            col("a.x").as("a_x"), col("a.y").as("a_y"),
            col("b.x").as("b_x"), col("b.y").as("b_y"),
            cheb.as("cheb"))
          .orderBy(col("cheb"), col("a_id"), col("b_id"))
          .limit(20)
      },
      Some(s"""WITH pts AS (
  SELECT c_custkey AS id,
    ${OracleHash.h64Sql("'gx:' || c_custkey")} % 1000000 AS x,
    ${OracleHash.h64Sql("'gy:' || c_custkey")} % 1000000 AS y
  FROM customer),
cells AS (SELECT id, x, y, x // $GeoCell AS cx, y // $GeoCell AS cy FROM pts),
probes AS (
  SELECT id, x, y, (cx + dx) * 1024 + cy + dy AS cell
  FROM cells CROSS JOIN (VALUES (-1),(0),(1)) AS ox(dx)
             CROSS JOIN (VALUES (-1),(0),(1)) AS oy(dy)),
anchors AS (SELECT id, x, y, cx * 1024 + cy AS cell FROM cells)
SELECT a.id AS a_id, b.id AS b_id, a.x AS a_x, a.y AS a_y,
  b.x AS b_x, b.y AS b_y,
  greatest(abs(a.x - b.x), abs(a.y - b.y)) AS cheb
FROM anchors a JOIN probes b ON a.cell = b.cell AND a.id < b.id
WHERE greatest(abs(a.x - b.x), abs(a.y - b.y)) <= $GeoCell
ORDER BY cheb, a_id, b_id LIMIT 20""")),

    // --- URL DECOMPOSITION + per-domain rollup: the crawl-curation
    // pass (CommonCrawl-style corpora key quality decisions on
    // registered domain). Deterministic synthetic URLs (the documents
    // table carries no URL column; the construction is stated in the
    // oracle) are parsed with Spark's codegen'd parse_url —
    // HOST / PATH / per-key QUERY extraction — then rolled up by
    // registered domain. The oracle restates parse_url as regexes,
    // which is the cross-engine proof that the extraction semantics
    // (not the builtin's implementation) are the contract. Narrow
    // maps into one two-phase aggregation; nothing shuffles but the
    // per-domain partials.
    QueryDef("q_url_parse",
      (spark, dir) => {
        val h = (tag: String) =>
          pmod(OracleHash.h64(concat(lit(tag + ":"), col("doc_id"))), lit(3))
        val urls = Tables.documents(spark, dir).select(
          col("doc_id"), col("n_chars"),
          concat(lit("https://"),
            element_at(array(lit("www"), lit("cdn"), lit("m")),
              h("sub").cast("int") + 1),
            lit("."), col("source"), lit("-site."),
            element_at(array(lit("com"), lit("org"), lit("net")),
              h("tld").cast("int") + 1),
            lit("/"), col("lang"), lit("/sec-"), col("doc_id") % 7,
            lit("/doc"), col("doc_id"), lit(".html?ref=r"), col("doc_id") % 5,
            lit("&sid="), col("doc_id") % 11).as("url"))
        val parsed = urls.select(col("doc_id"), col("n_chars"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'ref')").as("ref"))
        parsed.select(col("n_chars"), col("host"), col("ref"),
            regexp_extract(col("host"), "([^.]+[.][^.]+)$", 1).as("reg_domain"),
            (size(split(col("path"), "/")) - 1).as("path_depth"))
          .groupBy(col("reg_domain"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"),
            countDistinct(col("ref")).as("n_refs"),
            sum(col("path_depth")).cast("bigint").as("sum_depth"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("reg_domain"))
      },
      Some(s"""WITH urls AS (
  SELECT doc_id, n_chars,
    'https://' ||
    CASE ${OracleHash.h64Sql("'sub:' || doc_id")} % 3
      WHEN 0 THEN 'www' WHEN 1 THEN 'cdn' ELSE 'm' END ||
    '.' || source || '-site.' ||
    CASE ${OracleHash.h64Sql("'tld:' || doc_id")} % 3
      WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END ||
    '/' || lang || '/sec-' || CAST(doc_id % 7 AS VARCHAR) || '/doc' ||
    CAST(doc_id AS VARCHAR) || '.html?ref=r' || CAST(doc_id % 5 AS VARCHAR) ||
    '&sid=' || CAST(doc_id % 11 AS VARCHAR) AS url
  FROM documents),
parsed AS (
  SELECT doc_id, n_chars,
    regexp_extract(url, 'https://([^/]+)/', 1) AS host,
    regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
    regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
  FROM urls)
SELECT regexp_extract(host, '([^.]+[.][^.]+)$$', 1) AS reg_domain,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
  CAST(count(DISTINCT ref) AS BIGINT) AS n_refs,
  CAST(sum(len(string_split(path, '/')) - 1) AS BIGINT) AS sum_depth,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM parsed GROUP BY 1 ORDER BY 1""")),

    // --- DATA-QUALITY EXPECTATION SUITE (the Deequ/Great-Expectations
    // shape): one row per declared constraint — completeness,
    // uniqueness, referential integrity, range, enum membership,
    // consistency — with the violation count and a pass verdict. Each
    // per-table check family is ONE conditional aggregation (a single
    // scan however many checks share the table); the RI check is an
    // anti-join that broadcasts the key side when small. The suite is
    // the gate a 100 TB ingest runs before publishing a snapshot; on
    // this data customer.c_acctbal goes negative by construction, so
    // the suite demonstrably FAILS that check rather than
    // rubber-stamping everything.
    QueryDef("q_dq_checks",
      (spark, dir) => {
        val orders = Tables.orders(spark, dir)
        val bigCount = (c: org.apache.spark.sql.Column) =>
          sum(when(c, 1L).otherwise(0L))
        // one scan for the three orders checks
        val ordersChecks = orders.agg(
          bigCount(col("o_custkey").isNull).as("v_null"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
          bigCount(!col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
            .as("v_enum"),
          bigCount(col("o_totalprice") <= 0).as("v_pos"))
        val fromOrders = Seq(
          ("orders.o_custkey.not_null", "v_null"),
          ("orders.o_orderkey.unique", "v_uniq"),
          ("orders.o_orderpriority.enum", "v_enum"),
          ("orders.o_totalprice.positive", "v_pos"))
          .map { case (name, c) => ordersChecks.select(
            lit(name).as("check_name"), col(c).as("n_violations")) }
          .reduce(_ unionAll _)
        val ri = Tables.lineitem(spark, dir)
          .join(orders.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("lineitem.l_orderkey.ref_orders").as("check_name"),
            col("n_violations"))
        val qty = Tables.lineitem(spark, dir)
          .agg(bigCount(col("l_quantity") < 1 || col("l_quantity") > 50)
            .as("n_violations"))
          .select(lit("lineitem.l_quantity.range_1_50").as("check_name"),
            col("n_violations"))
        val bal = Tables.customer(spark, dir)
          .agg(bigCount(col("c_acctbal") < 0).as("n_violations"))
          .select(lit("customer.c_acctbal.non_negative").as("check_name"),
            col("n_violations"))
        val chars = Tables.documents(spark, dir)
          .agg(bigCount(col("n_chars") =!= length(col("text")))
            .as("n_violations"))
          .select(lit("documents.n_chars.matches_text").as("check_name"),
            col("n_violations"))
        fromOrders.unionAll(ri).unionAll(qty).unionAll(bal).unionAll(chars)
          .select(col("check_name"), col("n_violations"),
            (col("n_violations") === 0).as("pass"))
          .orderBy(col("check_name"))
      },
      Some("""WITH checks AS (
  SELECT 'orders.o_custkey.not_null' AS check_name,
    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'orders.o_orderkey.unique',
    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'orders.o_orderpriority.enum',
    CAST(count(*) FILTER (WHERE o_orderpriority NOT IN
      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders.o_totalprice.positive',
    CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'lineitem.l_orderkey.ref_orders',
    CAST(count(*) AS BIGINT) FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  UNION ALL
  SELECT 'lineitem.l_quantity.range_1_50',
    CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'customer.c_acctbal.non_negative',
    CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) FROM customer
  UNION ALL
  SELECT 'documents.n_chars.matches_text',
    CAST(count(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
  FROM documents)
SELECT check_name, n_violations, n_violations = 0 AS pass
FROM checks ORDER BY check_name""")),
  )
}
