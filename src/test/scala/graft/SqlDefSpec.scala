package graft

import org.apache.spark.sql.catalyst.expressions.{CaseWhen, ScalaUDF}

/** The SQL-definition surface's AT-SCALE contracts (queries/SqlDefOps):
  * a SQL UDF must INLINE — expanded expression in the optimized plan,
  * never an opaque call — so it codegens and predicates push through
  * it; a session variable must FOLD to a literal at parse time; a
  * table UDF's bound argument must reach the scan as a pushed filter.
  */
class SqlDefSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("scalar SQL UDF inlines: expanded CASE in the plan, no UDF node") {
    graft.model.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_sqldefspec_orders")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sds_tier(p DOUBLE) " +
      "RETURNS STRING RETURN CASE WHEN p >= 200000 THEN 'high' " +
      "WHEN p >= 100000 THEN 'mid' ELSE 'low' END")
    val plan = spark.sql("SELECT sds_tier(o_totalprice) t, count(*) n " +
      "FROM graft_sqldefspec_orders GROUP BY 1").queryExecution.optimizedPlan
    val exprs = plan.flatMap(_.expressions.flatMap(e => e +: e.children))
    assert(plan.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[CaseWhen]))), s"UDF body must inline as CaseWhen:\n$plan")
    assert(!plan.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[ScalaUDF]))), "a SQL UDF must never become a ScalaUDF")
    assert(exprs.nonEmpty)
  }

  test("table SQL UDF: the bound argument reaches the parquet scan as " +
    "a pushed filter") {
    graft.model.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_sqldefspec_orders")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sds_big(thr DOUBLE) " +
      "RETURNS TABLE(o_orderkey BIGINT) " +
      "RETURN SELECT o_orderkey FROM graft_sqldefspec_orders " +
      "WHERE o_totalprice > thr")
    val physical = spark.sql("SELECT * FROM sds_big(400000.0)")
      .queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThan(o_totalprice,400000.0)"),
      s"threshold must push to the scan:\n$physical")
  }

  test("session variable folds to a literal (no variable node at run)") {
    spark.sql("DECLARE OR REPLACE VARIABLE sds_thr DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR sds_thr = 123.5")
    val plan = spark.sql("SELECT sds_thr + 1.0 v")
      .queryExecution.optimizedPlan
    assert(plan.toString.contains("124.5"),
      s"variable must constant-fold:\n$plan")
    assert(!plan.toString.toLowerCase.contains("variablereference"),
      s"no runtime variable node:\n$plan")
  }
}
