package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructType}

/** Copy-on-write DELETE for the manifest format — the row-level half
  * the metadata-only fast path (GraftCatalogTable.decide) cannot
  * serve: a predicate that straddles part boundaries, or touches
  * non-key columns, rewrites ONLY the parts whose stats overlap it
  * and commits a new snapshot listing `untouched ++ rewritten`
  * (the Delta/Iceberg COW default; Armbrust et al., VLDB 2020 §4.1).
  *
  * Protocol (all through the format's own machinery — nothing
  * bypasses the commit path):
  *   1. classify parts from manifest stats: `untouched` (key range
  *      provably disjoint from the predicate's key conjuncts — a
  *      NULL key never satisfies a range conjunct, so null-key rows
  *      can't be deleted by one), `dropped` (pure key-range
  *      predicate, non-nullable key, part fully inside — every row
  *      provably matches), `affected` (the rest — must be rewritten),
  *   2. stage a temp read-manifest listing ONLY the affected parts
  *      (absolute paths: no data is copied to stage a read),
  *   3. distributed rewrite: scan those parts through the normal
  *      source, keep rows where the predicate is FALSE or NULL (SQL
  *      DELETE semantics), write them through the normal sink,
  *   4. move the new part files into the table dir and commit
  *      `untouched ++ rewritten` as the next history snapshot.
  *
  * Time travel is untouched by construction: prior snapshots still
  * list the pre-delete part files, which COW never deletes (VACUUM
  * owns their retirement). At 100 TB the rewrite cost is proportional
  * to the parts the predicate actually touches — on a range-
  * partitioned layout a retention delete rewrites exactly the one
  * boundary-straddling part.
  */
private[sources] object ManifestCow {

  /** The V1 filter subset this path can evaluate row-wise. Kept in
    * sync with [[toColumn]]; canDeleteWhere advertises exactly this,
    * so unsupported predicates are rejected at ANALYSIS, not midway
    * through a rewrite. */
  def translatable(f: Filter): Boolean = f match {
    case _: EqualTo | _: EqualNullSafe | _: GreaterThan |
         _: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual |
         _: In | _: IsNull | _: IsNotNull |
         _: StringStartsWith | _: StringEndsWith | _: StringContains => true
    case And(l, r) => translatable(l) && translatable(r)
    case Or(l, r)  => translatable(l) && translatable(r)
    case Not(c)    => translatable(c)
    case _         => false
  }

  private[sources] def toColumn(f: Filter): Column = f match {
    case EqualTo(c, v)            => col(c) === lit(v)
    case EqualNullSafe(c, v)      => col(c) <=> lit(v)
    case GreaterThan(c, v)        => col(c) > lit(v)
    case GreaterThanOrEqual(c, v) => col(c) >= lit(v)
    case LessThan(c, v)           => col(c) < lit(v)
    case LessThanOrEqual(c, v)    => col(c) <= lit(v)
    case In(c, vs)                => col(c).isin(vs.toIndexedSeq: _*)
    case IsNull(c)                => col(c).isNull
    case IsNotNull(c)             => col(c).isNotNull
    case StringStartsWith(c, v)   => col(c).startsWith(v)
    case StringEndsWith(c, v)     => col(c).endsWith(v)
    case StringContains(c, v)     => col(c).contains(v)
    case And(l, r)                => toColumn(l) && toColumn(r)
    case Or(l, r)                 => toColumn(l) || toColumn(r)
    case Not(c)                   => !toColumn(c)
    case other => throw new UnsupportedOperationException(
      s"DELETE predicate not supported for copy-on-write: $other")
  }

  def deleteWhere(path: String, schema: StructType,
      filters: Array[Filter]): Unit = {
    val conf = ManifestSink.driverConf()
    // Pin the BASE snapshot: the part classification below (and the
    // rewrite built on it) is only valid against this exact head. The
    // final publish passes strictBase so a commit that lands mid-COW
    // fails this delete loudly (ConcurrentModificationException)
    // instead of publishing a snapshot that silently drops the racing
    // commit's parts — a COW rewrite can't be mechanically re-applied
    // the way an append can.
    val baseVersion = ManifestSink.listVersions(conf, path)
      .lastOption.getOrElse(0)
    val parts =
      if (baseVersion == 0) ManifestSink.readManifestMeta(conf, path, None)
      else ManifestSink.readManifestMeta(conf, path, Some(baseVersion))
    val (touched, rewritten) = rewriteSurvivors(path, schema, filters, parts)
    if (touched.isEmpty) return // predicate provably matches no row
    ManifestSink.publishRebase(conf, path, schema, history = true,
      head => head.filterNot(p => touched.contains(p.path)) ++ rewritten,
      strictBase = Some(baseVersion), footprint = Some(touched),
      op = "delete")
  }

  /** The COW kernel shared by DELETE and REPLACE WHERE: classify the
    * pinned base `parts` against the predicate's key conjuncts, run
    * the distributed survivor rewrite for the straddling parts, and
    * return (touched part paths, rewritten survivor parts) — WITHOUT
    * publishing. The caller owns the commit, so a REPLACE WHERE can
    * fold `filterNot(touched) ++ rewritten ++ itsNewParts` into ONE
    * atomic snapshot (delete-half and append-half never visible
    * separately). */
  private[sources] def rewriteSurvivors(path: String, schema: StructType,
      filters: Array[Filter],
      parts: Seq[PartMeta]): (Set[String], Seq[PartMeta]) = {
    val spark = SparkSession.active
    val conf = ManifestSink.driverConf()

    // Key-range bounds from the TOP-LEVEL key conjuncts only (the
    // filters array is a conjunction). Used to PRUNE the rewrite set,
    // so looseness is safe: any conjunct we don't understand just
    // means "can't exclude this part".
    val keyF = schema.fields.find(_.dataType == LongType)
    val key = keyF.map(_.name)
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var pureKeyRange = keyF.exists(!_.nullable)
    filters.foreach {
      case GreaterThan(c, v: Long) if key.contains(c) =>
        lo = math.max(lo, if (v == Long.MaxValue) v else v + 1)
      case GreaterThanOrEqual(c, v: Long) if key.contains(c) =>
        lo = math.max(lo, v)
      case LessThan(c, v: Long) if key.contains(c) =>
        hi = math.min(hi, if (v == Long.MinValue) v else v - 1)
      case LessThanOrEqual(c, v: Long) if key.contains(c) =>
        hi = math.min(hi, v)
      case EqualTo(c, v: Long) if key.contains(c) =>
        lo = math.max(lo, v); hi = math.min(hi, v)
      case _ => pureKeyRange = false
    }
    val bounded = lo != Long.MinValue || hi != Long.MaxValue
    // disjoint stats ⇒ no row can satisfy the key conjuncts ⇒ untouched
    val (untouched, rest) = parts.partition(p =>
      bounded && (p.kMin <= p.kMax) && (p.kMax < lo || p.kMin > hi))
    // pure aligned range + non-nullable key ⇒ every row matches ⇒ drop
    val (dropped, affected) = rest.partition(p =>
      pureKeyRange && p.kMin >= lo && p.kMax <= hi)

    // head-aware rebases + footprints from here on: the parts this
    // delete DROPS or REWRITES are its conflict footprint — a racing
    // commit touching only other parts (an append, a vector on an
    // untouched part) composes, because the rebase maps the advanced
    // head rather than re-rendering the stale base capture
    val droppedPaths = dropped.map(_.path).toSet
    if (affected.isEmpty) return (droppedPaths, Seq.empty)
    val fs = new Path(path).getFileSystem(conf)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmpRead = s"$path/_cow-read-$token"
    val tmpWrite = s"$path/_cow-write-$token"
    try {
      // stage 2: a manifest over the affected parts, by reference —
      // carrying the table's column mapping so mixed-generation part
      // layouts decode correctly through the staging read
      ManifestSink.publishSnapshot(conf, tmpRead, schema, affected,
        history = false,
        colmap = ManifestSink.alignedColMap(conf, path, schema))
      // stage 3: DELETE keeps rows where the predicate is FALSE or
      // NULL — the three-valued-logic contract a naive `!pred` breaks
      val pred = filters.map(toColumn).reduceOption(_ && _).getOrElse(lit(true))
      spark.read.format("graft.sources.ManifestSource")
        .option("path", tmpRead).load()
        .filter(not(coalesce(pred, lit(false))))
        .write.format("graft.sources.ManifestSink")
        .option("path", tmpWrite).mode("overwrite").save()
      // stage 4: adopt the surviving parts into the table dir
      val rewritten = ManifestSink.readManifestMeta(conf, tmpWrite, None)
        .filter(_.rows > 0)
        .map { p =>
          val src = new Path(p.path)
          val dst = new Path(path, src.getName)
          if (!fs.rename(src, dst)) throw new java.io.IOException(
            s"COW part adoption failed: $src -> $dst")
          p.copy(path = dst.toString)
        }
      // dropped parts stay referenced only by prior snapshots
      (droppedPaths ++ affected.map(_.path), rewritten)
    } finally {
      fs.delete(new Path(tmpRead), true)
      fs.delete(new Path(tmpWrite), true)
    }
  }
}
