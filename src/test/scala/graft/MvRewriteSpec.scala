package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.sources.MvRewrite

/** Transparent MV routing (sources/MvRewrite): a GROUP BY rollup the
  * MV already stores is answered from the MV — the optimized plan
  * loses its Aggregate and scans the MV table — while ANY exactness
  * hazard (stale watermark, extra filter, distinct, unknown column)
  * falls back to the source untouched. Fresh-path and fallback-path
  * answers are pinned equal to the direct rollup. */
class MvRewriteSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-mvrw").toString
    spark.conf.set("spark.sql.catalog.gmvr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmvr.warehouse", d)
    d
  }

  private def rows(k0: Long, k1: Long): DataFrame = {
    import spark.implicits._
    (k0 until k1).map(i => (i, s"g${i % 7}", i * 0.5)).toDF("k", "s", "v")
  }

  private def write(df: DataFrame, mode: String): Unit =
    df.repartition(4)
      .write.format("graft.sources.ManifestSink")
      .option("path", s"$wh/ns/src").option("history", "true")
      .mode(mode).save()

  private val rollupSql =
    """SELECT s, count(*) AS n,
      |  CAST(CAST(sum(CAST(v AS DECIMAL(30,2))) AS STRING) AS DOUBLE) AS sv
      |FROM gmvr.ns.src GROUP BY s""".stripMargin

  private def collectSet(df: DataFrame): Set[(String, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Aggregate])

  private def scansMv(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("/ns/mv")

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewrite
    spark.conf.set("graft.mv.rewrite", s"$wh/ns/mv")
    try body finally {
      spark.conf.unset("graft.mv.rewrite")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
    }
  }

  test("fresh MV answers the rollup; stale falls back; refresh re-arms") {
    write(rows(0, 800), "overwrite")
    spark.sql("CALL gmvr.system.create_mv(mv_table => 'ns.mv', " +
      "source_table => 'ns.src', key_col => 's', sum_col => 'v', " +
      "scale => 2)")
    val direct = collectSet(spark.sql(rollupSql)) // un-rewritten baseline

    withRule {
      val q = spark.sql(rollupSql)
      assert(!hasAggregate(q) && scansMv(q),
        s"fresh MV must replace the aggregate:\n${q.queryExecution.optimizedPlan}")
      assert(collectSet(q) === direct, "rewritten answer must be exact")

      // STALE: a source commit the MV has not folded → full fallback,
      // and the answer includes the new rows
      write(rows(800, 900), "append")
      val stale = spark.sql(rollupSql)
      assert(hasAggregate(stale) && !scansMv(stale),
        "stale MV must fall back to the source")
      assert(collectSet(stale) !== direct, "fallback sees the new rows")

      // refresh re-arms the rewrite at the new watermark
      spark.sql("CALL gmvr.system.refresh_mv(mv_table => 'ns.mv')")
      val again = spark.sql(rollupSql)
      assert(!hasAggregate(again) && scansMv(again))
      assert(collectSet(again) === collectSet(stale),
        "post-refresh rewrite equals the direct answer over the head")
    }
  }

  test("exactness hazards decline: filter, distinct, other aggregate, wrong scale") {
    // (source + MV as left by the previous test: fresh at v2)
    withRule {
      assert(hasAggregate(spark.sql(
        rollupSql.replace("FROM gmvr.ns.src", "FROM gmvr.ns.src WHERE k > 10"))),
        "a residual filter must block the rewrite")
      assert(hasAggregate(spark.sql(
        "SELECT s, count(DISTINCT k) AS n FROM gmvr.ns.src GROUP BY s")),
        "distinct aggregates must decline")
      assert(hasAggregate(spark.sql(
        "SELECT s, max(v) AS m FROM gmvr.ns.src GROUP BY s")),
        "aggregates the MV does not store must decline")
      assert(hasAggregate(spark.sql(
        """SELECT s, count(*) AS n,
          |  CAST(CAST(sum(CAST(v AS DECIMAL(30,4))) AS STRING) AS DOUBLE) AS sv
          |FROM gmvr.ns.src GROUP BY s""".stripMargin)),
        "a different decimal scale must decline")
    }
  }

  test("downstream operators bind unchanged over the substituted plan") {
    withRule {
      // ORDER BY + projection above the rewritten aggregate: the alias
      // exprIds are preserved, so the sort binds to the MV-backed attrs
      val q = spark.sql(rollupSql + " ORDER BY n DESC, s")
      assert(!hasAggregate(q) && scansMv(q))
      val top = q.limit(3).collect()
      assert(top.length === 3 && top.map(_.getLong(1)).toSeq.sorted.reverse
        === top.map(_.getLong(1)).toSeq, "sorted by the rewritten count")
    }
  }
}
