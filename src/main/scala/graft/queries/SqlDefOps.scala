package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.model.Tables

/** SQL DEFINITION surface — the four Spark-4 features that let a SQL
  * user build ABSTRACTIONS without leaving SQL: scalar SQL UDFs
  * (`CREATE FUNCTION ... RETURN expr`), table-valued SQL UDFs
  * (`RETURNS TABLE`), session variables (`DECLARE` / `SET VAR` /
  * `EXECUTE IMMEDIATE ... INTO` / `IDENTIFIER()`), and string
  * collations (`COLLATE UTF8_LCASE`).
  *
  * Reference correspondence: the reference hard-codes its domain
  * constants and per-station parametrization in Python
  * (`estimate_queue.py:24-41` thresholds, lane multipliers) — these
  * are the mechanisms a SQL consumer uses to encode exactly that kind
  * of domain logic ON the engine, reusably, instead of copy-pasting
  * expressions per query.
  *
  * The at-scale property, pinned by SqlDefSpec: a SQL UDF INLINES at
  * resolution time — the optimized plan contains the expanded
  * expression (one Project / ordinary filters), never an opaque
  * function call. So SQL UDFs cost NOTHING at 100 TB: full codegen,
  * predicate pushdown through them, no serialization wall — the
  * opposite of a JVM/Python UDF. Session variables fold to literals
  * at parse time; collations ride the UTF8String comparator, not a
  * per-row lambda.
  */
object SqlDefOps {

  val all: Seq[QueryDef] = Seq(

    // --- SCALAR SQL UDF: the order-tier classifier every revenue
    // dashboard re-types, defined once. The function body is pure
    // SQL, so it INLINES — the grouped rollup below plans as one
    // partial+final hash aggregate over a codegen'd CASE projection
    // (SqlDefSpec pins the inlining), and the decimal-exact sum
    // convention holds through the UDF boundary.
    QueryDef("q_sql_udf",
      (spark, dir) => {
        Tables.orders(spark, dir)
          .createOrReplaceTempView("graft_sqldef_orders")
        spark.sql("""
          CREATE OR REPLACE TEMPORARY FUNCTION graft_tier(p DOUBLE)
          RETURNS STRING
          RETURN CASE WHEN p >= 200000 THEN 'high'
                      WHEN p >= 100000 THEN 'mid'
                      ELSE 'low' END""")
        spark.sql(s"""
          SELECT graft_tier(o_totalprice) AS tier,
                 count(*) AS n,
                 CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,2)))
                   AS STRING) AS DOUBLE) AS revenue
          FROM graft_sqldef_orders
          GROUP BY graft_tier(o_totalprice)
          ORDER BY tier""")
      },
      Some(s"""SELECT CASE WHEN o_totalprice >= 200000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS tier,
  CAST(count(*) AS BIGINT) AS n,
  ${Exact.decSumSql("o_totalprice", 2)} AS revenue
FROM orders GROUP BY 1 ORDER BY tier""")),

    // --- TABLE-VALUED SQL UDF (RETURNS TABLE): a PARAMETERIZED view
    // — the body is a full query with the argument bound into its
    // WHERE, so callers get "the big orders above X" as a relation.
    // The body inlines like the scalar form: the threshold reaches
    // the scan as an ordinary pushed filter, and different call
    // sites with different arguments plan independently — a view
    // can't do that without session-variable contortions.
    QueryDef("q_sql_table_udf",
      (spark, dir) => {
        Tables.orders(spark, dir)
          .createOrReplaceTempView("graft_sqldef_orders")
        spark.sql("""
          CREATE OR REPLACE TEMPORARY FUNCTION graft_big_orders(
            thr DOUBLE)
          RETURNS TABLE(o_orderkey BIGINT, o_custkey BIGINT,
                        price DECIMAL(18,2))
          RETURN SELECT o_orderkey, o_custkey,
                        CAST(o_totalprice AS DECIMAL(18,2))
                 FROM graft_sqldef_orders WHERE o_totalprice > thr""")
        // two call sites, two thresholds, one statement — the shape a
        // parameterized view exists for
        spark.sql("""
          SELECT 'p400k' AS band, count(*) AS n,
                 min(o_orderkey) AS first_key
          FROM graft_big_orders(400000.0)
          UNION ALL
          SELECT 'p450k' AS band, count(*) AS n,
                 min(o_orderkey) AS first_key
          FROM graft_big_orders(450000.0)
          ORDER BY band""")
      },
      Some("""SELECT band, CAST(n AS BIGINT) AS n, first_key FROM (
  SELECT 'p400k' AS band, count(*) AS n, min(o_orderkey) AS first_key
  FROM orders WHERE o_totalprice > 400000.0
  UNION ALL
  SELECT 'p450k' AS band, count(*) AS n, min(o_orderkey) AS first_key
  FROM orders WHERE o_totalprice > 450000.0) ORDER BY band""")),

    // --- SESSION VARIABLES + EXECUTE IMMEDIATE + IDENTIFIER: the
    // scripting triple. A variable CAPTURES a computed scalar once
    // (`SET VAR thr = (subquery)`) and every later statement folds it
    // as a literal — the "compute a threshold, reuse it across the
    // report" pattern without a driver round-trip per use. EXECUTE
    // IMMEDIATE runs dynamic SQL with `?` parameters bound via USING
    // and lands scalars INTO variables; IDENTIFIER() turns a variable
    // into a COLUMN reference safely (no string-concat SQL injection
    // — the parser validates it as one identifier).
    QueryDef("q_sql_variables",
      (spark, dir) => {
        Tables.orders(spark, dir)
          .createOrReplaceTempView("graft_sqldef_orders")
        spark.sql("DECLARE OR REPLACE VARIABLE graft_thr DOUBLE " +
          "DEFAULT 0.0")
        spark.sql("SET VAR graft_thr = (SELECT CAST(CAST(sum(CAST(" +
          "o_totalprice AS DECIMAL(30,2))) AS STRING) AS DOUBLE) " +
          "/ count(*) FROM graft_sqldef_orders)")
        spark.sql("DECLARE OR REPLACE VARIABLE graft_nbig BIGINT " +
          "DEFAULT 0")
        spark.sql("EXECUTE IMMEDIATE 'SELECT count(*) FROM " +
          "graft_sqldef_orders WHERE o_totalprice > ?' " +
          "INTO graft_nbig USING graft_thr")
        spark.sql("DECLARE OR REPLACE VARIABLE graft_key_col STRING " +
          "DEFAULT 'o_orderkey'")
        spark.sql("""
          SELECT round(graft_thr, 2) AS avg_price,
                 graft_nbig AS n_above_avg,
                 max(IDENTIFIER(graft_key_col)) AS max_key
          FROM graft_sqldef_orders""")
      },
      Some(s"""SELECT
  round((SELECT ${Exact.decSumSql("o_totalprice", 2)} / count(*)
         FROM orders), 2) AS avg_price,
  (SELECT CAST(count(*) AS BIGINT) FROM orders
   WHERE o_totalprice > (SELECT ${Exact.decSumSql("o_totalprice", 2)}
                         / count(*) FROM orders)) AS n_above_avg,
  max(o_orderkey) AS max_key
FROM orders""")),

    // --- COLLATIONS (UTF8_LCASE): case-insensitive COMPARE without
    // normalizing the stored value — equality, DISTINCT counting and
    // grouping ride a collation-aware comparator in the engine (the
    // UTF8String compare kernel), not a per-row lower() rewrite. The
    // fixture derives a mixed-case column deterministically, then
    // pins: collated count(DISTINCT) merges case variants, collated
    // equality matches across case, and a collated GROUP BY keyed on
    // the DETERMINISTIC canonical form (min of the variants is NOT
    // deterministic under ties — lower() is) restates the rollup.
    QueryDef("q_collation",
      (spark, dir) => {
        Tables.events(spark, dir).select(
          col("event_id"), col("user_id"),
          when(col("event_id") % 2 === 0, upper(col("event_type")))
            .otherwise(col("event_type")).as("etype"))
          .createOrReplaceTempView("graft_sqldef_events")
        spark.sql("""
          SELECT count(DISTINCT etype COLLATE UTF8_LCASE) AS n_ci,
                 count(DISTINCT etype) AS n_cs,
                 count(CASE WHEN etype = 'CLICK' COLLATE UTF8_LCASE
                       THEN 1 END) AS n_click_ci,
                 count(CASE WHEN etype = 'CLICK' THEN 1 END)
                   AS n_click_cs
          FROM graft_sqldef_events""")
      },
      Some("""SELECT
  CAST(count(DISTINCT lower(etype)) AS BIGINT) AS n_ci,
  CAST(count(DISTINCT etype) AS BIGINT) AS n_cs,
  CAST(count(CASE WHEN lower(etype) = 'click' THEN 1 END) AS BIGINT)
    AS n_click_ci,
  CAST(count(CASE WHEN etype = 'CLICK' THEN 1 END) AS BIGINT)
    AS n_click_cs
FROM (SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
             ELSE event_type END AS etype FROM events)""")),

    // --- PARAMETERIZED SQL (named parameter markers — Spark 4's
    // `spark.sql(text, args)`): the injection-safe spelling of
    // templated queries — `:name` markers bind TYPED literals at
    // analysis, so the text is cacheable and user input never
    // concatenates into SQL. Resolution-time only: the bound plan is
    // identical to the inlined spelling (which is exactly what the
    // oracle states), markers fold like any literal — predicate
    // pushdown and partition pruning see the constant.
    QueryDef("q_sql_params",
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .createOrReplaceTempView("graft_params_lineitem")
        spark.sql(
          """SELECT l_returnflag,
               count(*) AS n,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,6)))
                 AS STRING) AS DOUBLE) AS qty
             FROM graft_params_lineitem
             WHERE l_quantity >= :minqty AND l_returnflag IN (:m1, :m2)
             GROUP BY l_returnflag ORDER BY l_returnflag""",
          Map("minqty" -> 25, "m1" -> "A", "m2" -> "R"))
      },
      Some(s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
  ${graft.functions.Exact.decSumSql("l_quantity")} AS qty
FROM lineitem
WHERE l_quantity >= 25 AND l_returnflag IN ('A', 'R')
GROUP BY l_returnflag ORDER BY l_returnflag""")))
}
