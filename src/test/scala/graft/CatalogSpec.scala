package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** DDL/DML surface of the V2 TableCatalog (sources/GraftCatalog.scala).
  * The read/write/aggregate answer is oracle-gated via q_sql_catalog;
  * these pin what SQL-only paths must do: CREATE/DROP/list, INSERT
  * OVERWRITE as logical truncate, snapshot time travel from SQL, and
  * the commit-point existence rule. */
class CatalogSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-catspec").toString
    spark.conf.set("spark.sql.catalog.gcs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs.warehouse", d)
    d
  }

  test("CREATE TABLE publishes a schema-only snapshot; table is empty and listed") {
    wh
    spark.sql("CREATE TABLE gcs.ns.fresh (k BIGINT, s STRING)")
    assert(spark.sql("SELECT * FROM gcs.ns.fresh").count() === 0)
    assert(spark.sql("SELECT * FROM gcs.ns.fresh").schema.fieldNames.toSeq
      === Seq("k", "s"))
    val listed = spark.sql("SHOW TABLES IN gcs.ns").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(listed.contains("fresh"))
    // CREATE on an existing table must fail, not silently truncate
    intercept[Exception] {
      spark.sql("CREATE TABLE gcs.ns.fresh (k BIGINT)")
    }
  }

  test("INSERT INTO appends a snapshot; INSERT OVERWRITE logically truncates") {
    wh
    spark.sql("CREATE TABLE gcs.ns.dml (k BIGINT, s STRING)")
    spark.sql("INSERT INTO gcs.ns.dml VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcs.ns.dml VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM gcs.ns.dml").count() === 3)
    spark.sql("INSERT OVERWRITE gcs.ns.dml VALUES (9, 'z')")
    val rows = spark.sql("SELECT k, s FROM gcs.ns.dml").collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 9L)
    // ...but history survives the overwrite: the pre-overwrite
    // snapshot (v3 = create + 2 inserts) still reads all 3 rows
    assert(spark.sql("SELECT * FROM gcs.ns.dml VERSION AS OF 3").count() === 3)
    assert(spark.sql("SELECT * FROM gcs.ns.dml VERSION AS OF 2").count() === 2)
  }

  test("filters push down through catalog-loaded scans (part pruning intact)") {
    wh
    import spark.implicits._
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(8, col("k"))
      .write.format("graft.sources.ManifestSink")
      .option("path", s"$wh/ns/pruned").option("history", "true")
      .mode("overwrite").save()
    val df = spark.sql("SELECT k FROM gcs.ns.pruned WHERE k = 17")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(17L))
    // the catalog table plans through ManifestScan: the point lookup
    // must open a strict subset of the 8 parts (bloom + range stats)
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ManifestScan")).getOrElse("")
    val parts = "parts=(\\d+)/(\\d+)".r.findFirstMatchIn(scanLine)
    assert(parts.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"expected pruned scan, got: $scanLine")
  }

  test("DROP TABLE removes it; existence follows the committed-manifest rule") {
    wh
    spark.sql("CREATE TABLE gcs.ns.gone (k BIGINT)")
    assert(spark.catalog.tableExists("gcs.ns.gone") ||
      spark.sql("SHOW TABLES IN gcs.ns").collect()
        .exists(_.getAs[String]("tableName") == "gone"))
    spark.sql("DROP TABLE gcs.ns.gone")
    intercept[Exception] { spark.sql("SELECT * FROM gcs.ns.gone").collect() }
    // a directory without a committed manifest is NOT a table
    Files.createDirectories(java.nio.file.Paths.get(wh, "ns", "halfmade"))
    intercept[Exception] { spark.sql("SELECT * FROM gcs.ns.halfmade").collect() }
  }

  test("DELETE FROM: metadata-only on part-aligned ranges; undecidable deletes rejected") {
    wh
    import spark.implicits._
    // range-partitioned layout: each part owns a disjoint key range,
    // so retention deletes are decidable from manifest stats alone
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "s")
      .repartitionByRange(4, col("k"))
      .write.format("graft.sources.ManifestSink")
      .option("path", s"$wh/ns/del").option("history", "true")
      .mode("overwrite").save()
    val conf = spark.sessionState.newHadoopConf()
    val partsBefore = graft.sources.ManifestSink.readManifest(conf, s"$wh/ns/del")
    assert(partsBefore.size === 4)
    // cut at the last part's kMin: that part is provably all-match,
    // every other part provably none-match
    val cut = partsBefore.map(_._3).max
    val dropped = partsBefore.filter(_._3 >= cut).map(_._2).sum
    val filesBefore = new java.io.File(s"$wh/ns/del").listFiles()
      .count(_.getName.startsWith("part-"))

    spark.sql(s"DELETE FROM gcs.ns.del WHERE k >= $cut")
    assert(spark.sql("SELECT * FROM gcs.ns.del").count() === 1000 - dropped)
    // metadata-only: no data file was touched, and time travel still
    // reads the pre-delete snapshot in full
    val filesAfter = new java.io.File(s"$wh/ns/del").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(filesAfter === filesBefore, "DELETE must not touch data files")
    assert(spark.sql("SELECT * FROM gcs.ns.del VERSION AS OF 1").count() === 1000)

    // a range straddling a part is not stats-decidable → COPY-ON-WRITE:
    // only the straddling part is rewritten; disjoint parts carry
    // their files forward BY REFERENCE (same paths in the new
    // snapshot), and the superseded file stays on disk for time travel
    val straddle = partsBefore.map(_._3).filter(_ < cut).max + 1
    def headParts() = graft.sources.ManifestSink
      .readManifest(conf, s"$wh/ns/del").map(_._1).toSet
    val untouchedExpected = headParts().filter { p =>
      partsBefore.exists(b => b._1 == p && b._4 < straddle)
    }
    spark.sql(s"DELETE FROM gcs.ns.del WHERE k >= $straddle")
    assert(spark.sql("SELECT * FROM gcs.ns.del").count() === straddle)
    val afterStraddle = headParts()
    assert(untouchedExpected.subsetOf(afterStraddle),
      "disjoint parts must carry forward by reference, not be rewritten")
    assert((afterStraddle -- untouchedExpected).size === 1,
      "exactly the straddling part must be rewritten")
    val filesAfterCow = new java.io.File(s"$wh/ns/del").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(filesAfterCow === filesBefore + 1,
      "COW adds the rewritten part and never deletes data files")
    assert(spark.sql("SELECT * FROM gcs.ns.del VERSION AS OF 1").count() === 1000)

    // a non-key predicate COWs every part (no stats can exclude any)
    spark.sql("DELETE FROM gcs.ns.del WHERE s = 'v3'")
    assert(spark.sql("SELECT * FROM gcs.ns.del").count() === straddle - 1)
    assert(spark.sql("SELECT * FROM gcs.ns.del VERSION AS OF 1").count() === 1000)

    // an untranslatable predicate is still rejected at analysis
    intercept[Exception] {
      spark.sql("DELETE FROM gcs.ns.del WHERE k + 1 = 500")
    }
    assert(spark.sql("SELECT * FROM gcs.ns.del").count() === straddle - 1)
  }

  test("TIMESTAMP AS OF resolves the newest snapshot at or before the instant") {
    wh
    import java.nio.file.attribute.FileTime
    import java.nio.file.{Files => JFiles, Paths}
    spark.sql("CREATE TABLE gcs.ns.tt (k BIGINT, s STRING)")      // v1
    spark.sql("INSERT INTO gcs.ns.tt VALUES (1, 'a'), (2, 'b')")  // v2
    spark.sql("INSERT INTO gcs.ns.tt VALUES (3, 'c')")            // v3
    // pin distinct commit times without sleeping: v1/v2 happened
    // 20/10 minutes ago, v3 now (version-file mtime IS commit time)
    val dir = s"$wh/ns/tt"
    val now = System.currentTimeMillis()
    JFiles.setLastModifiedTime(
      Paths.get(dir, graft.sources.ManifestSink.versionFile(1)),
      FileTime.fromMillis(now - 20 * 60 * 1000))
    JFiles.setLastModifiedTime(
      Paths.get(dir, graft.sources.ManifestSink.versionFile(2)),
      FileTime.fromMillis(now - 10 * 60 * 1000))
    def atMinus(min: Int): Long = {
      val ts = new java.sql.Timestamp(now - min * 60 * 1000)
      spark.sql(s"SELECT count(*) FROM gcs.ns.tt TIMESTAMP AS OF '$ts'")
        .head.getLong(0)
    }
    assert(atMinus(15) === 0, "15 min ago the table was the empty v1")
    assert(atMinus(5) === 2, "5 min ago v2 (two rows) was the head")
    assert(atMinus(0) === 3, "now the head is v3")
    intercept[Exception] { atMinus(60) } // before the first commit: loud
  }

  test("SQL h64() == the Column helper == per-row over a table") {
    wh
    val sqlV = spark.sql("SELECT gcs.ns.h64('graft:42') AS h").head.getLong(0)
    val colV = evalOne[Long](graft.functions.OracleHash.h64(lit("graft:42")))
    assert(sqlV === colV)
    spark.range(20).selectExpr("CAST(id AS STRING) AS s")
      .createOrReplaceTempView("graft_h64_in")
    val pairs = spark.sql(
      "SELECT s, gcs.ns.h64(s) AS h FROM graft_h64_in").collect()
    pairs.foreach { r =>
      assert(r.getLong(1) ===
        evalOne[Long](graft.functions.OracleHash.h64(lit(r.getString(0)))),
        s"h64 mismatch for '${r.getString(0)}'")
    }
  }

  test("catalog tables stream by NAME: readStream.table tails the snapshot log") {
    wh
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE TABLE gcs.ns.feed (k BIGINT, s STRING)")
    spark.sql("INSERT INTO gcs.ns.feed VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcs.ns.feed VALUES (3, 'c')")
    val q = spark.readStream.table("gcs.ns.feed")
      .writeStream.format("memory").queryName("graft_cat_feed")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("graft_cat_feed").count() === 3)
  }
}
