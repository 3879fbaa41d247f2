package graft

import java.nio.file.Files

/** Persistent SQL views on the V2 catalog (sources/GraftViews.scala,
  * ViewCatalog on GraftCatalog): CREATE/REPLACE/DROP/SHOW/ALTER/
  * RENAME, resolution of the stored SQL text against catalog tables,
  * and composition with time travel. The aggregate answer through a
  * view is oracle-gated via q_sql_view; these pin the lifecycle. */
class ViewSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-viewspec").toString
    spark.conf.set("spark.sql.catalog.gvs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvs.warehouse", d)
    spark.sql("CREATE TABLE gvs.ns.base (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gvs.ns.base VALUES (1, 10), (2, 20), (3, 30)")
    d
  }

  test("CREATE VIEW persists; SELECT resolves the stored SQL") {
    wh
    spark.sql("CREATE VIEW gvs.ns.big AS SELECT k, v FROM gvs.ns.base WHERE v > 15")
    val rows = spark.sql("SELECT k FROM gvs.ns.big ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // the view tracks the TABLE, not a snapshot of its rows
    spark.sql("INSERT INTO gvs.ns.base VALUES (4, 40)")
    assert(spark.sql("SELECT count(*) FROM gvs.ns.big").head.getLong(0) === 3L)
    // duplicate CREATE fails; OR REPLACE redefines
    intercept[Exception] {
      spark.sql("CREATE VIEW gvs.ns.big AS SELECT k FROM gvs.ns.base")
    }
    spark.sql("CREATE OR REPLACE VIEW gvs.ns.big AS " +
      "SELECT k FROM gvs.ns.base WHERE v > 35")
    assert(spark.sql("SELECT count(*) FROM gvs.ns.big").head.getLong(0) === 1L)
  }

  test("SHOW VIEWS lists; DROP VIEW removes; table/view names collide") {
    wh
    spark.sql("CREATE VIEW gvs.ns.listed AS SELECT k FROM gvs.ns.base")
    val shown = spark.sql("SHOW VIEWS IN gvs.ns").collect()
      .map(_.getAs[String]("viewName")).toSet
    assert(shown.contains("listed"))
    // a view may not shadow a table
    intercept[Exception] {
      spark.sql("CREATE VIEW gvs.ns.base AS SELECT 1 AS x")
    }
    spark.sql("DROP VIEW gvs.ns.listed")
    intercept[Exception] {
      spark.sql("SELECT * FROM gvs.ns.listed").collect()
    }
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES; RENAME keeps the definition") {
    wh
    spark.sql("CREATE VIEW gvs.ns.propd AS SELECT k FROM gvs.ns.base")
    spark.sql("ALTER VIEW gvs.ns.propd SET TBLPROPERTIES ('team' = 'data')")
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog}
    val cat = spark.sessionState.catalogManager.catalog("gvs")
      .asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array("ns"), "propd")
    assert(cat.loadView(ident).properties().get("team") === "data")
    spark.sql("ALTER VIEW gvs.ns.propd UNSET TBLPROPERTIES ('team')")
    assert(!cat.loadView(ident).properties().containsKey("team"))
    spark.sql("ALTER VIEW gvs.ns.propd RENAME TO gvs.ns.renamed")
    assert(spark.sql("SELECT count(*) FROM gvs.ns.renamed").head.getLong(0) >= 3L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gvs.ns.propd").collect()
    }
  }

  test("a view composes with time travel (frozen snapshot behind a name)") {
    wh
    spark.sql("CREATE TABLE gvs.ns.tt (k BIGINT)")
    spark.sql("INSERT INTO gvs.ns.tt VALUES (1), (2)")          // v2
    spark.sql("INSERT INTO gvs.ns.tt VALUES (3)")               // v3
    spark.sql("CREATE VIEW gvs.ns.tt_v2 AS " +
      "SELECT count(*) AS n FROM gvs.ns.tt VERSION AS OF 2")
    assert(spark.sql("SELECT n FROM gvs.ns.tt_v2").head.getLong(0) === 2L)
    // new commits do not move the frozen view
    spark.sql("INSERT INTO gvs.ns.tt VALUES (4)")
    assert(spark.sql("SELECT n FROM gvs.ns.tt_v2").head.getLong(0) === 2L)
  }

  test("view SQL with quotes/braces round-trips the record format") {
    wh
    spark.sql("""CREATE VIEW gvs.ns.quoted AS
      SELECT concat('a"b', '}', ',', k) AS s FROM gvs.ns.base""")
    val n = spark.sql("SELECT count(*) FROM gvs.ns.quoted").head.getLong(0)
    assert(n >= 3L)
    assert(spark.sql("SELECT s FROM gvs.ns.quoted").head.getString(0)
      .startsWith("a\"b},"))
  }

  test("nested views expand recursively; cycles fail loudly") {
    wh
    spark.sql("CREATE VIEW gvs.ns.lvl1 AS SELECT k, v FROM gvs.ns.base WHERE v > 5")
    spark.sql("CREATE VIEW gvs.ns.lvl2 AS SELECT k FROM gvs.ns.lvl1 WHERE v > 15")
    assert(spark.sql("SELECT count(*) FROM gvs.ns.lvl2").head.getLong(0) >= 2L)
    // a cycle: redefine lvl1 to read lvl2
    spark.sql("CREATE OR REPLACE VIEW gvs.ns.lvl1 AS SELECT k, k AS v FROM gvs.ns.lvl2")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gvs.ns.lvl2").collect()
    }
    assert(e.getMessage.contains("cyclic view reference"))
  }

  test("a WITH clause inside the view text analyzes (manual CTE substitution)") {
    wh
    spark.sql("""CREATE VIEW gvs.ns.cted AS
      WITH big AS (SELECT k, v FROM gvs.ns.base WHERE v > 15)
      SELECT count(*) AS n FROM big""")
    assert(spark.sql("SELECT n FROM gvs.ns.cted").head.getLong(0) >= 2L)
  }
}
