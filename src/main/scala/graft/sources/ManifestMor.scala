package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, collect_list, lit}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** MERGE-ON-READ DELETE via deletion vectors — the metadata-commit
  * alternative to [[ManifestCow]]'s rewrite (Delta deletion vectors /
  * Iceberg positional deletes): instead of rewriting every affected
  * part, the delete marks the matched rows' ORDINALS in per-part
  * bitmaps and commits ONE tiny snapshot; data files are untouched
  * and every reader masks the flagged rows ([[DeleteVector]]).
  *
  * When to choose which (the same dial real lakehouses expose):
  *  - COW: delete-heavy parts, read-heavy tables — pay the rewrite
  *    once, reads stay mask-free;
  *  - MOR: wide deletes touching many parts sparsely (GDPR erasure of
  *    one user across 100k parts) — pay O(matched rows) metadata now,
  *    a small mask check per read later; compaction (`q_sink_compact`
  *    shape) or any COW rewrite later CLEARS the vectors naturally
  *    because rewrites read through the masking source.
  *
  * Protocol:
  *  1. scan the table through the normal source with the (`_part`,
  *     `_pos`) metadata address, keeping rows where the predicate is
  *     TRUE (the rows to delete — note the polarity: COW keeps
  *     survivors, MOR records victims);
  *  2. aggregate matched ordinals per part (executor-side; the
  *     driver sees one bitmap-sized list per AFFECTED part, bounded
  *     by matched rows — at 100 TB a production format writes DV side
  *     files from executors and the manifest carries references, the
  *     same spill note as [[PartBloom]]);
  *  3. commit one snapshot whose affected parts carry
  *     `old_dv OR new_dv`, pinned to the base version (strictBase —
  *     a racing commit fails this delete loudly).
  *
  * The change feed replays a vector commit as EXACTLY the
  * newly-flagged ordinals ('delete' rows) — precise row-level CDC,
  * cheaper than COW's part restatement. Time travel reads the old
  * manifest and therefore the old (or no) vector: pre-delete
  * snapshots stay intact by construction.
  */
private[sources] object ManifestMor {

  /** Session conf that routes translatable catalog DELETEs through
    * deletion vectors instead of copy-on-write. */
  val ModeConf = "graft.delete.mode"

  def morEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(ModeConf).exists(_.equalsIgnoreCase("mor"))

  def deleteWhere(path: String, schema: StructType,
      filters: Array[Filter]): Unit = {
    val spark = SparkSession.active
    val conf = ManifestSink.driverConf()
    val baseVersion = ManifestSink.listVersions(conf, path)
      .lastOption.getOrElse(0)
    val parts =
      if (baseVersion == 0) ManifestSink.readManifestMeta(conf, path, None)
      else ManifestSink.readManifestMeta(conf, path, Some(baseVersion))
    val byPath = parts.map(p => p.path -> p).toMap

    // rows to DELETE: predicate TRUE (NULL/FALSE rows survive — same
    // three-valued contract as ManifestCow, opposite polarity)
    val pred: Column = filters.map(ManifestCow.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val reader = spark.read.format("graft.sources.ManifestSource")
      .option("path", path)
    val matched = (if (baseVersion > 0) // pin the scanned base snapshot
        reader.option("version", baseVersion.toString) else reader)
      .load()
      .select(col(PartMetaColumn.Name).as("p"), col(PosMetaColumn.Name).as("o"),
        coalesce(pred, lit(false)).as("del"))
      .filter(col("del"))
      .groupBy(col("p")).agg(collect_list(col("o")).as("ords"))
      .collect()

    if (matched.isEmpty) return // nothing to delete: no empty commit
    val updated: Map[String, String] = matched.map { r =>
      val p = r.getString(0)
      val meta = byPath.getOrElse(p, throw new IllegalStateException(
        s"scan reported unknown part $p"))
      val add = DeleteVector.fromOrdinals(
        r.getSeq[Long](1), meta.rows)
      p -> DeleteVector.toHex(DeleteVector.union(meta.dvBits, add))
    }.toMap

    ManifestSink.publishRebase(conf, path, schema, history = true,
      head => head.map(p => updated.get(p.path)
        .map(dv => p.copy(dvHex = dv)).getOrElse(p)),
      strictBase = Some(baseVersion))
  }
}
