package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Column DEFAULT values (colmap-header storage, CURRENT vs EXISTS
  * split): the contracts beyond the gated q_column_default — time
  * travel to the pre-ADD schema, DROP DEFAULT semantics, compaction
  * materializing served defaults, and survival under rename. */
class DefaultsSpec extends SparkSpec {

  private lazy val wh = {
    val d = Files.createTempDirectory("graft-defspec").toString
    spark.conf.set("spark.sql.catalog.gdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdf.warehouse", d)
    d
  }

  test("initial defaults: time travel predates the column; DROP DEFAULT " +
    "stops write-filling but old rows keep the frozen value; compaction " +
    "materializes; rename keeps the default (field-id keyed)") {
    val _ = wh
    spark.sql("CREATE TABLE gdf.ns.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gdf.ns.t VALUES (1, 0.5), (2, 1.5)") // v2
    spark.sql("ALTER TABLE gdf.ns.t ADD COLUMN tag STRING DEFAULT 'x'")
    def tags(): Seq[(Long, String)] =
      spark.sql("SELECT k, tag FROM gdf.ns.t ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tags() === Seq((1L, "x"), (2L, "x")), "existing rows serve it")
    // the pre-ADD snapshot has no such column at all
    val v2 = spark.read.format("graft.sources.ManifestSource")
      .option("path", s"$wh/ns/t").option("version", "2").load()
    assert(!v2.schema.fieldNames.contains("tag"))
    // DROP DEFAULT: future writes stop filling; frozen EXISTS stays
    spark.sql("ALTER TABLE gdf.ns.t ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO gdf.ns.t (k, v) VALUES (3, 2.5)")
    assert(tags() === Seq((1L, "x"), (2L, "x"), (3L, null)),
      "post-drop insert gets NULL; pre-ADD rows keep 'x'")
    // RENAME keeps the default (keyed by stable field id)
    spark.sql("ALTER TABLE gdf.ns.t RENAME COLUMN tag TO label")
    assert(spark.sql("SELECT label FROM gdf.ns.t WHERE k = 1")
      .head.getString(0) === "x")
    // compaction MATERIALIZES the served value into rewritten lines —
    // the answer is unchanged, and now physically stored
    spark.sql("CALL gdf.system.compact(table => 'ns.t', target_parts => 1)")
    assert(spark.sql("SELECT k, label FROM gdf.ns.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "x"), (3L, null)))
  }
}
