package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Round-15 SQL-surface wave: the two headline Spark 4 SQL features —
  * recursive CTEs (`WITH RECURSIVE`, Catalyst `UnionLoop`) and the
  * VARIANT semi-structured type (`parse_json`/`variant_get`) — plus
  * the quality-of-life resolution rules (GROUP BY ALL, lateral column
  * aliases) a SQL user coming from DuckDB/Snowflake expects.
  *
  * Reference correspondence: the reference's per-station estimate feed
  * is consumed by SQL users (estimate_queue.py:166-178 emits keyed
  * rows downstream dashboards query); these are the query shapes that
  * consumption layer writes. The `props` JSON column generalizes the
  * reference's prediction-dict assembly (estimate_queue.py:85-88) into
  * a first-class semi-structured type instead of per-query string
  * parsing.
  *
  * Scale notes live on each query; the recursive CTE is the one shape
  * where Spark's execution model is genuinely iterative (one shuffle
  * round per recursion level, driver-coordinated like the [[GraphOps]]
  * fixed-points) — use it for bounded-depth hierarchies, never for
  * diameter-unbounded graphs (that is [[GraphOps.connectedComponents]]
  * pointer-jumping's job at O(log d) rounds).
  */
object SqlOps4 {

  val all: Seq[QueryDef] = Seq(

    // --- RECURSIVE CTE (WITH RECURSIVE → UnionLoop): walk the
    // intra-region nation chain (parent = previous nationkey in the
    // region) computing per-node depth and the root→node path.
    // Complements q_recursive_cte (Extras — per-depth profile over a
    // digit-strip tree) with the PATH-ACCUMULATION shape: a string
    // column grown one edge per level, over edges derived in-query
    // by a window function rather than stored. The
    // hierarchy-traversal shape (org charts, BOM explosions, folder
    // trees) that plain SQL cannot express without recursion. Scale
    // shape: each recursion level is ONE distributed hash join of the
    // frontier against the (small, reusable) edge table — the frontier
    // never collects to the driver; total work is O(edges × depth)
    // with depth bounded by the hierarchy, and Spark's
    // cteRecursionLevelLimit fail-fasts a cyclic parent graph instead
    // of looping forever.
    QueryDef("q_recursive_path",
      (spark, dir) => {
        Tables.nation(spark, dir).select(
          col("n_nationkey").as("id"),
          col("n_regionkey").as("rk"),
          col("n_name").as("name"),
          lag(col("n_nationkey"), 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("n_regionkey")).orderBy(col("n_nationkey")))
            .as("parent"))
          .createOrReplaceTempView("graft_rcte_chain")
        spark.sql("""
          WITH RECURSIVE walk AS (
            SELECT id, rk, name, 0 AS depth, CAST(name AS STRING) AS path
            FROM graft_rcte_chain WHERE parent IS NULL
            UNION ALL
            SELECT c.id, c.rk, c.name, w.depth + 1,
                   concat(w.path, '>', c.name)
            FROM graft_rcte_chain c JOIN walk w ON c.parent = w.id
          )
          SELECT id, rk, name, depth, path FROM walk ORDER BY id""")
      },
      Some("""WITH RECURSIVE chain AS (
  SELECT n_nationkey AS id, n_regionkey AS rk, n_name AS name,
         lag(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS parent
  FROM nation
), walk AS (
  SELECT id, rk, name, 0 AS depth, CAST(name AS VARCHAR) AS path
  FROM chain WHERE parent IS NULL
  UNION ALL
  SELECT c.id, c.rk, c.name, w.depth + 1, w.path || '>' || c.name
  FROM chain c JOIN walk w ON c.parent = w.id
)
SELECT id, rk, name, depth, path FROM walk ORDER BY id""")),

    // --- VARIANT (Spark 4 semi-structured type): parse the JSON
    // `props` column ONCE into a variant, then extract typed paths —
    // the schema-on-read shape that replaces per-query
    // get_json_object string re-parsing. A variant column is stored
    // as a compact binary (metadata dictionary + value buffer), so at
    // 100 TB the parse cost is paid at INGEST, extraction is a typed
    // offset walk (no JSON text scan per query), and shredded paths
    // prune like ordinary columns. Exercised: scalar extraction with
    // a type (`$.k` as INT), a MISSING path (try_variant_get → NULL,
    // never an error), canonical re-serialization (to_json of the
    // variant — compact, key-ordered), and a nested document built
    // in-query then path-extracted through the variant binary
    // (`$.ids[0]` — array index + cast in one walk).
    QueryDef("q_variant_json",
      (spark, dir) => {
        val v = parse_json(col("props"))
        val built = parse_json(to_json(struct(
          col("event_type").as("t"), array(col("user_id")).as("ids"))))
        // sort first (the one range exchange the query always paid),
        // parse after: the per-row variant build/extract then runs on
        // the post-shuffle partitions instead of the one-task
        // single-file scan stage (guide §2.5)
        graft.util.Par.sortedFanOut(
          Tables.events(spark, dir)
            .select(col("event_id"), col("props"), col("event_type"),
              col("user_id")),
          col("event_id"))
          .select(
            col("event_id"),
            variant_get(v, "$.k", "int").as("k"),
            try_variant_get(v, "$.absent", "string").as("absent"),
            to_json(v).as("canon"),
            variant_get(built, "$.ids[0]", "bigint").as("id0"),
            variant_get(built, "$.t", "string").as("t"))
      },
      Some("""SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k,
  CAST(NULL AS VARCHAR) AS absent,
  json_extract(props, '$')::VARCHAR AS canon,
  user_id AS id0,
  event_type AS t
FROM events ORDER BY event_id""")),

    // --- GROUP BY ALL / ORDER BY ALL: the resolution sugar a
    // DuckDB/Snowflake user types first — group by every
    // non-aggregate select item (no positional drift when the select
    // list evolves), order by the whole list left-to-right (a total
    // order, so the output is deterministic by construction). Plan
    // shape is identical to the explicit spelling: one partial+final
    // hash aggregate, decimal-exact sums. (A lateral alias inside
    // GROUP BY ALL is the one spelling Spark still rejects —
    // UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS_IN_GROUP_BY — so the
    // lateral-alias surface is pinned on the projection query below.)
    QueryDef("q_group_by_all",
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .createOrReplaceTempView("graft_gba_lineitem")
        // decimal-exact sum spelled in Spark dialect (STRING, not
        // VARCHAR) — same algebra as Exact.decSumSql's DuckDB text
        val qty =
          "CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS STRING) AS DOUBLE)"
        spark.sql(s"""
          SELECT l_returnflag,
                 l_linestatus,
                 $qty AS qty,
                 count(*) AS n,
                 $qty * 2 AS qty2
          FROM graft_gba_lineitem
          GROUP BY ALL
          ORDER BY ALL""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
  ${graft.functions.Exact.decSumSql("l_quantity")} AS qty,
  count(*) AS n,
  ${graft.functions.Exact.decSumSql("l_quantity")} * 2 AS qty2
FROM lineitem GROUP BY ALL ORDER BY ALL""")),

    // --- SQL PIPE SYNTAX (`|>`, Spark 4 / GoogleSQL pipes): the
    // linear query spelling — source first, then one transformation
    // per stage in EXECUTION order (no inside-out SELECT nesting).
    // Pure surface syntax: each pipe stage resolves to the same
    // Catalyst operator its ANSI spelling would (the oracle IS that
    // ANSI spelling, so the gate proves plan-semantics equality), so
    // adopting the readable form costs nothing at any scale.
    QueryDef("q_sql_pipe",
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .createOrReplaceTempView("graft_pipe_lineitem")
        spark.sql("""
          FROM graft_pipe_lineitem
          |> WHERE l_quantity > 10
          |> EXTEND CAST(l_extendedprice AS DECIMAL(30,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4))) AS net
          |> AGGREGATE count(*) AS n,
               CAST(CAST(sum(net) AS STRING) AS DOUBLE) AS revenue
             GROUP BY l_returnflag
          |> ORDER BY l_returnflag""")
      },
      Some("""SELECT l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))
    * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE)
    AS revenue
FROM lineitem WHERE l_quantity > 10
GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --- SQL SCRIPTING (BEGIN ... END compound statements, Spark 4):
    // procedural control flow ON the engine — DECLARE'd locals, SET
    // from scalar subqueries, IF/ELSE branching, a WHILE loop issuing
    // one query per iteration — without a driver-side language. Each
    // embedded statement is an ordinary distributed query; the script
    // only sequences them, so there is no per-row interpretive cost.
    // The loop partitions the orders by key residue and accumulates
    // the band counts — re-derivable, so the oracle restates it.
    QueryDef("q_sql_scripting",
      (spark, dir) => {
        Tables.orders(spark, dir)
          .createOrReplaceTempView("graft_script_orders")
        spark.conf.set("spark.sql.scripting.enabled", "true")
        spark.sql("""BEGIN
          DECLARE avg_price DOUBLE;
          DECLARE band STRING;
          DECLARE i INT DEFAULT 0;
          DECLARE acc BIGINT DEFAULT 0;
          SET avg_price = (SELECT CAST(CAST(sum(CAST(o_totalprice AS
            DECIMAL(30,2))) AS STRING) AS DOUBLE) / count(*)
            FROM graft_script_orders);
          IF avg_price > 100000 THEN
            SET band = 'high';
          ELSE
            SET band = 'low';
          END IF;
          WHILE i < 3 DO
            SET acc = acc + (SELECT count(*) FROM graft_script_orders
              WHERE o_orderkey % 3 = i);
            SET i = i + 1;
          END WHILE;
          SELECT round(avg_price, 2) AS avg_price, band,
                 acc AS n_total;
        END""")
      },
      Some(s"""SELECT
  round((SELECT ${graft.functions.Exact.decSumSql("o_totalprice", 2)}
         / count(*) FROM orders), 2) AS avg_price,
  CASE WHEN (SELECT ${graft.functions.Exact.decSumSql("o_totalprice", 2)}
             / count(*) FROM orders) > 100000
       THEN 'high' ELSE 'low' END AS band,
  CAST(count(*) AS BIGINT) AS n_total
FROM orders""")),

    // --- LATERAL COLUMN ALIAS in a projection: a select item
    // references the alias defined two items earlier in the SAME
    // list, resolved left-to-right (Spark 3.4+/DuckDB) — the chained
    // derived-column spelling that otherwise forces a subquery nest
    // per step. Resolution-time sugar only: the analyzed plan is one
    // Project, fully codegen'd, nothing materializes between steps.
    QueryDef("q_lateral_alias",
      (spark, dir) => {
        Tables.orders(spark, dir)
          .createOrReplaceTempView("graft_lca_orders")
        spark.sql("""
          SELECT o_orderkey,
                 CAST(o_totalprice AS DOUBLE) AS price,
                 price * 2 AS gross,
                 gross + 1 AS gross1
          FROM graft_lca_orders
          ORDER BY o_orderkey""")
      },
      // DOUBLE outputs, per the repo-wide output contract (no
      // DecimalType output columns — the driver hash renders a
      // decimal's fixed-scale string on one side and its shortest
      // float repr on the other, so any trailing-zero value diverges;
      // r17 probes proved width is irrelevant). o_totalprice is a
      // parquet double, *2 and +1 are exact IEEE ops at this
      // magnitude, so both engines emit bit-identical doubles. The
      // lateral-alias chain itself (gross referencing price, gross1
      // referencing gross) is intact and is what this query gates.
      Some("""SELECT o_orderkey,
  CAST(o_totalprice AS DOUBLE) AS price,
  price * 2 AS gross,
  gross + 1 AS gross1
FROM orders ORDER BY o_orderkey""")),

    // --- XML FUNCTIONS (from_xml + the Hive xpath_* family, both
    // native in Spark 4): the OTHER semi-structured wire format —
    // feeds, SOAP-era APIs, sitemap/config ingests. Each row renders
    // a deterministic XML document from its own columns, then parses
    // it back two ways: schema-full (`from_xml` → typed struct, the
    // ingest shape) and schema-less probing (`xpath_string`/
    // `xpath_long`/`xpath` — the exploration shape). The oracle
    // restates every extracted field from the source columns, so the
    // gate proves render→parse is lossless for strings, BIGINTs and
    // exact decimals. Scale shape: `from_xml` is a per-row StAX parse
    // inside one projection — no shuffle, no UDF — and runs over the
    // FULL corpus; the Hive xpath_* probes re-parse the document into
    // a DOM on EVERY call (3 probes ≈ 3 extra parses per row — 41 s
    // at sf0.1 when applied corpus-wide, the bench caught it), so
    // they run on a deterministic 1-in-50 sample: the exploration
    // tool is gated exactly without paying exploration cost on every
    // row. At 100 TB the same split holds — from_xml once into typed
    // columns, xpath only to probe. (Numeric transport rides
    // DECIMAL(18,6) strings — double rendering differs across
    // engines, decimal rendering does not.)
    QueryDef("q_xml_funcs",
      (spark, dir) => {
        val xml = concat(lit("<e><t>"), col("event_type"),
          lit("</t><u>"), col("user_id").cast("string"),
          lit("</u><v>"),
          col("value").cast("decimal(18,6)").cast("string"),
          lit("</v></e>"))
        val xsch = org.apache.spark.sql.types.StructType.fromDDL(
          "t STRING, u BIGINT, v DECIMAL(18,6)")
        val sampled = col("event_id") % 50 === 0
        // sort FIRST (same single range exchange the query always
        // paid), parse AFTER: the from_xml/xpath walk over every row
        // then runs on the post-shuffle partitions instead of inside
        // the one-task single-file scan stage (guide §2.5; isolated
        // bench 2.15 s → see OPTIMIZATION_r20.md)
        graft.util.Par.sortedFanOut(
          Tables.events(spark, dir).select(col("event_id"), xml.as("x")),
          col("event_id"))
          .select(col("event_id"), from_xml(col("x"), xsch).as("e"),
            col("x"))
          .select(
            col("event_id"),
            col("e.t").as("t"),
            col("e.u").as("u"),
            // Output as DOUBLE via the decimal's string rendering
            // (the repo's Exact.decSumSql convention): the output
            // contract bans DecimalType output columns (driver hash
            // floats decimals on one side — every trailing-zero
            // value diverges at any width, r17 probes). The wire
            // transport inside the XML stays (18,6) strings.
            col("e.v").cast("string").cast("double").as("v"),
            when(sampled, expr("xpath_string(x, '/e/t')")).as("xp_t"),
            when(sampled, expr("xpath_long(x, '/e/u')")).as("xp_u"),
            when(sampled,
              expr("CAST(size(xpath(x, '/e/*/text()')) AS INT)"))
              .as("n_children"))
        // total order already established by sortedFanOut (range
        // partitioning + in-partition sort on the unique event_id)
      },
      Some("""SELECT event_id,
  event_type AS t, user_id AS u,
  CAST(CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE) AS v,
  CASE WHEN event_id % 50 = 0 THEN event_type END AS xp_t,
  CASE WHEN event_id % 50 = 0 THEN user_id END AS xp_u,
  CASE WHEN event_id % 50 = 0 THEN CAST(3 AS INT) END AS n_children
FROM events ORDER BY event_id""")))
}
