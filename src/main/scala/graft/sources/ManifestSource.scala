package graft.sources

import java.util
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 READ path over a [[ManifestSink]]-committed table —
  * closing the warehouse loop: what one job commits (part files + a
  * `_MANIFEST.json` carrying the schema and per-part key statistics),
  * a later job scans with metadata-level pruning, never trusting the
  * directory listing.
  *
  *  - The schema comes from the manifest header, not from sampling
  *    files (self-describing table, like any modern table format).
  *  - Only files LISTED in the manifest are planned: orphans from
  *    failed attempts are invisible to readers by construction.
  *  - Range predicates on the key column (the first LongType field —
  *    the same convention the writer's min/max tracker uses) prune
  *    whole part files at planning time against the manifest's
  *    per-part (min, max): the DSv2 analog of data skipping on footer
  *    statistics. Pushed filters are also reported as residual, so
  *    Spark re-evaluates them row-level — a pruning bound mistake
  *    could only cost performance, never rows.
  *  - Point predicates (`=` / fully-typed `IN`) additionally consult
  *    the per-part BLOOM filter ([[PartBloom]]) both at planning and
  *    at runtime-filter time: on a hash layout, where every part
  *    spans the full key range and zone maps are useless, absence
  *    proofs still skip parts. Bloom answers are only ever "surely
  *    absent" — same residual-filter safety as the range stats.
  *  - Column pruning reaches the decoder: an unused column is split
  *    but never parsed/allocated.
  *  - `estimateStatistics` reports the POST-PRUNING row count from the
  *    manifest, so the planner can (e.g.) pick a broadcast join for a
  *    selectively-scanned table.
  *
  * All filesystem access uses the session Hadoop configuration:
  * captured on the driver, shipped to readers via
  * [[SerializableConfiguration]] — same discipline as the sink.
  *
  * At 100 TB, manifest-listed planning + stats pruning is the
  * difference between "scan 100k files to answer a keyed lookup" and
  * "open the three parts whose range can match".
  */
object ManifestSource {
  /** NESTED field ids per parent field id from a snapshot's column
    * mapping — the logical side of depth-1 struct resolution
    * (logical sub-field position -> stable nested id; the part's
    * recorded sub-layout maps the id to a sub-token slot). Empty ⇒
    * identity everywhere (no struct ever evolved). */
  private[sources] def nestedIdsFor(
      snapCm: Option[(StructType, ColMap)]): Map[Int, Seq[Int]] =
    snapCm match {
      case Some((_, cm)) if cm.nested.nonEmpty =>
        cm.nested.map { case (pid, n) => pid -> n.ids }
      case _ => Map.empty
    }

  /** DEPTH-1 STRUCT decode plans, shared by the batch and CDF
    * readers: for each required struct field, resolve every REQUIRED
    * sub-field (possibly nested-pruned, so by NAME against the full
    * struct) -> stable nested id (identity when the struct never
    * evolved) -> the part's recorded sub-layout (identity when
    * absent) — the top-level column-mapping rule one level down.
    * `null` at non-struct / meta positions. */
  private[sources] def structPlansFor(required: StructType,
      schema: StructType, ids: Seq[Int],
      nestedIds: Map[Int, Seq[Int]], partNcols: Map[Int, Seq[Int]],
      metaCols: Set[String]): Array[(Array[Int], Array[DataType])] =
    required.fields.map { f =>
      f.dataType match {
        case reqSt: StructType if !metaCols.contains(f.name) =>
          val li = schema.fieldIndex(f.name)
          val fullSt = schema.fields(li).dataType.asInstanceOf[StructType]
          val id = if (ids.nonEmpty) ids(li) else li
          val curIds = nestedIds.getOrElse(id, fullSt.fields.indices.toSeq)
          val layout = partNcols.getOrElse(id, Seq.empty)
          val slots = reqSt.fields.map { sf =>
            val sid = curIds(fullSt.fieldIndex(sf.name))
            if (layout.isEmpty) sid
            else {
              val sl = layout.indexOf(sid)
              if (sl < 0) Int.MaxValue else sl
            }
          }
          (slots, reqSt.fields.map(_.dataType))
        case _ => null
      }
    }
}

class ManifestSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "option 'path' is required")
    // TIME TRAVEL: `option("version", n)` resolves the schema AND the
    // part list from that immutable snapshot manifest — each snapshot
    // carries its own schema, so reading v1 after an additive
    // evolution still yields v1's (narrower) schema.
    // BRANCH: `option("branch", name)` resolves the branch head (the
    // write-audit-publish staging line; main-head fallback while the
    // branch has no commits).
    val version = Option(options.get("version")).map(_.toInt)
    val branch = Option(options.get("branch")).filter(_.nonEmpty)
    require(branch.isEmpty || version.isEmpty,
      "options 'branch' and 'version' are mutually exclusive")
    val base = branch
      .map(b => ManifestSink.readBranchSchema(ManifestSink.driverConf(), path, b))
      .getOrElse(
        ManifestSink.readSchema(ManifestSink.driverConf(), path, version))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed manifest (with schema header) at $path"))
    // CHANGE FEED: `option("changeFeed", "true")` widens the schema
    // with the change metadata columns — the readChangeFeed shape
    if ("true".equalsIgnoreCase(options.get("changeFeed")))
      StructType(base.fields ++ ManifestCdf.MetaFields)
    else base
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestReadTable(properties.get("path"), schema,
      Option(properties.get("version")).map(_.toInt),
      "true".equalsIgnoreCase(properties.get("changeFeed")),
      Option(properties.get("branch")).filter(_.nonEmpty))
}

private[sources] class ManifestReadTable(
    path: String, schema: StructType, version: Option[Int],
    cdf: Boolean = false, branch: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  require(path != null && path.nonEmpty, "option 'path' is required")
  /** The table dir when this is a plain HEAD read (no time travel, no
    * change feed, no branch) — the only path-read shape [[MvRewrite]]
    * may substitute before scan planning. */
  private[sources] def plainHeadDir: Option[String] =
    if (version.isEmpty && !cdf && branch.isEmpty) Some(path) else None
  require(branch.isEmpty || !cdf,
    "the change feed follows the MAIN snapshot line; 'branch' and " +
      "'changeFeed' are mutually exclusive")
  /** `_part` provenance is available on path reads too (not just
    * catalog tables) — but not on change feeds, whose schema already
    * carries its own metadata columns. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (cdf) Array.empty else Array(PartMetaColumn, PosMetaColumn)
  override def name(): String =
    s"manifest($path${version.map(v => s"@v$v").getOrElse("")}" +
      branch.map(b => s"@$b").getOrElse("") +
      (if (cdf) "@changes" else "") + ")"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path, schema,
      new SerializableConfiguration(ManifestSink.driverConf()), version, cdf,
      startingVersion = StreamOptions.resolveStarting(options,
        ManifestSink.driverConf(), path),
      branch = branch,
      maxPartsPerTrigger = StreamOptions.maxPartsPerTrigger(options))
}

private[sources] class ManifestScanBuilder(
    path: String, schema: StructType, conf: SerializableConfiguration,
    version: Option[Int] = None, cdf: Boolean = false,
    rowLevelOwner: Option[ManifestRowLevelOp] = None,
    startingVersion: Option[Int] = None,
    branch: Option[String] = None,
    maxPartsPerTrigger: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  // the writer tracked min/max of the first LongType column; the
  // reader prunes on exactly the same column
  private val keyCol: Option[String] =
    schema.fields.find(_.dataType == LongType).map(_.name)

  private val strCol: Option[String] =
    schema.fields.find(_.dataType == StringType).map(_.name)

  private var required: StructType = schema
  private var keyLo: Long = Long.MinValue // inclusive
  private var keyHi: Long = Long.MaxValue // inclusive
  // string bounds (binary collation, inclusive) on the first string
  // column, from pushed predicates — pruned against smin/smax stats
  private var strLo: Option[String] = None
  private var strHi: Option[String] = None
  // discrete IN-list values on the primary string column (see the In
  // case below — the range alone can't exclude lexically-between
  // values); intersected across conjunctive In filters
  private var strInSet: Option[Set[String]] = None
  // GENERALIZED column bounds from pushed predicates on ANY OTHER
  // long/string column — pruned against the per-part [[ColStat]]
  // record; a part with no stat for a bounded column is kept (absent
  // means "cannot prune", covering legacy manifests and all-null
  // parts alike)
  private var cLongLo = Map.empty[String, Long]
  private var cLongHi = Map.empty[String, Long]
  private var cStrLo = Map.empty[String, String]
  private var cStrHi = Map.empty[String, String]
  // discrete point values per STRING column (EqualTo / fully-typed
  // In), intersected across conjuncts — consulted against the
  // column's declared SECONDARY BLOOM ([[ColStat.bloom]]) where
  // min/max ranges admit nearly every part (URLs, digests, UUIDs)
  private var cStrPoints = Map.empty[String, Set[String]]
  private def addStrPoints(c: String, vs: Set[String]): Unit =
    cStrPoints += c -> cStrPoints.get(c).fold(vs)(_ intersect vs)
  // IS [NOT] NULL predicates, pruned against the per-part NULL COUNTS
  // (key/first-string columns always tracked; other long/string
  // columns via their ColStat record); unknown (-1, legacy) never
  // prunes
  private var isNullCols = Set.empty[String]
  private var notNullCols = Set.empty[String]
  // candidate key values from point predicates (EqualTo / fully-typed
  // In), intersected across conjuncts — enables bloom pruning, which
  // range bounds can't do on hash-layout parts
  private var points: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty
  private var sawFilters = false
  // the accepted metadata aggregate's (output schema, final rows) —
  // computed by [[computeMetaAgg]] at pushdown time from one manifest
  // read, served verbatim by [[ManifestAggScan]]
  private var aggResult: Option[(StructType, Seq[Array[Any]])] = None
  private var limit: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** METADATA-ONLY aggregation: a global COUNT(*) / COUNT(col) /
    * MIN / MAX / SUM is exactly what the manifest already stores per
    * part, so the scan answers it without opening a single data
    * file — the 100 TB "count a petabyte table from its footers" path
    * every real table format serves. Accepted ONLY when no filters
    * reached the scan (ours are residual, so Spark would re-filter
    * rows that no longer exist). GROUP BY is additionally accepted
    * when every live part is provably SINGLE-VALUED on every grouping
    * column (the identity-partitioned layout `option("splitBy", c)`
    * writes, recorded as min==max per-part stats) — the classic
    * "rows per day over 100k files" answered from the manifest alone,
    * one output row per group. SUM answers from the writer's exact
    * per-part sums ([[PartMeta.kSum]] / [[ColStat.sum]]); a fold that
    * would overflow a Long declines instead of wrapping. Complete
    * pushdown: emitted rows carry final values, not partials. */
  private def canPushAgg(a: Aggregation): Boolean = metaAggAnswer(a).isDefined

  // decision AND answer from ONE manifest read per Aggregation
  // instance, so accept/serve can never straddle a racing commit
  // (Spark calls supportCompletePushDown and pushAggregation with the
  // same object)
  private var aggCache:
      Option[(Aggregation, Option[(StructType, Seq[Array[Any]])])] = None
  private def metaAggAnswer(a: Aggregation)
      : Option[(StructType, Seq[Array[Any]])] = aggCache match {
    case Some((prev, r)) if prev eq a => r
    case _ =>
      val r = computeMetaAgg(a)
      aggCache = Some((a, r))
      r
  }

  /** The full metadata answer — `(output schema, final rows)` — or
    * None to decline and scan data. Output layout is the DSv2
    * complete-pushdown contract: grouping columns first (in
    * [[Aggregation.groupByExpressions]] order), then one column per
    * aggregate. */
  private def computeMetaAgg(a: Aggregation)
      : Option[(StructType, Seq[Array[Any]])] = {
    // a rewrite scan must yield ROWS, never a summary; residual
    // filters would make any summary over-wide
    if (rowLevelOwner.nonEmpty || sawFilters ||
        a.aggregateExpressions.isEmpty) return None
    def name(e: Expression): Option[String] = e match {
      case nr: NamedReference => Some(nr.fieldNames.mkString("."))
      case _ => None
    }
    def fieldOf(n: String): Option[StructField] =
      schema.fields.find(_.name == n)
    // a branch read must answer from the BRANCH head, never main's
    val meta: Seq[PartMeta] =
      if (branch.isDefined)
        ManifestSink.readSnapshot(conf.value, path, None, branch)._1
      else ManifestSink.readManifestMeta(conf.value, path, version)
    // MIN/MAX/SUM stats are stale once a deletion vector exists (the
    // extreme/summed rows may be the deleted ones) — COUNT(*) stays
    // exact via visibleRows, so it alone survives DVs
    val anyDv = meta.exists(_.hasDv)
    // pending EQUALITY-DELETE clauses make even row counts unknown
    // without a scan (matches are metadata-invisible): every
    // metadata answer declines until compaction settles the clauses
    if (meta.exists(_.eq.nonEmpty)) return None
    val live = meta.filter(_.rows > 0)

    // ---- grouping: every group expression must be a long/string
    // column on which every live part is provably SINGLE-VALUED —
    // min==max with zero nulls, or uniformly NULL — the layout
    // `option("splitBy", c)` writes. One straddling/unknown part
    // declines the whole answer.
    val groupNames: Seq[String] = a.groupByExpressions.toSeq.map { e =>
      name(e).filter(n => fieldOf(n).exists(f =>
        f.dataType == LongType || f.dataType == StringType)) match {
        case Some(n) => n
        case None => return None
      }
    }
    def groupValue(p: PartMeta, c: String): Option[Any] =
      if (keyCol.contains(c)) {
        if (p.kNulls == 0 && p.kMin == p.kMax)
          Some(java.lang.Long.valueOf(p.kMin))
        else if (p.kNulls > 0 && p.kNulls == p.rows) Some(null)
        else None // straddles, or legacy (kNulls == -1)
      } else if (strCol.contains(c)) {
        if (p.sNulls == 0 && p.sMin.isDefined && p.sMin == p.sMax)
          Some(p.sMin.get)
        else if (p.sNulls > 0 && p.sNulls == p.rows) Some(null)
        else None
      } else p.cstats.get(c) match {
        case Some(st) if st.nulls == 0 && st.min == st.max =>
          Some(if (st.kind == 'l') java.lang.Long.valueOf(st.lMin)
            else st.min)
        // absent entry = all-null part OR legacy manifest — the two
        // are indistinguishable here, so decline both
        case _ => None
      }
    if (groupNames.nonEmpty && (anyDv ||
        live.exists(p => groupNames.exists(c => groupValue(p, c).isEmpty))))
      return None

    // ---- per-aggregate answerability (uniform across parts)
    def isKeyRef(n: String) = keyCol.contains(n)
    // the STRING stats column folds exactly: the writer records
    // sMin/sMax in UTF8 binary order — Spark's own string collation —
    // and `sMin == None` MEANS "no non-null strings in this part"
    def isStrRef(n: String) = strCol.contains(n)
    // ANY OTHER long/string column answers from its [[ColStat]]
    // record — but ONLY when every live part carries one: a part with
    // rows and no entry is an all-null part, a legacy manifest, or a
    // column beyond the writer's tracking cap, and the first is the
    // only one where skipping would be correct — declining all three
    // keeps the metadata answer provably exact
    def isStatRef(n: String): Boolean =
      !isKeyRef(n) && !isStrRef(n) &&
        fieldOf(n).exists(f =>
          f.dataType == LongType || f.dataType == StringType ||
            f.dataType == org.apache.spark.sql.types.TimestampType) &&
        meta.forall(p => p.visibleRows == 0 || p.cstats.contains(n))
    def statAnswerable(n: String): Boolean =
      isKeyRef(n) || isStrRef(n) || isStatRef(n)
    // COUNT(col) = Σ (rows − null count), answerable when every part
    // carries a null count for the column
    def countAnswerable(n: String): Boolean =
      if (isKeyRef(n)) meta.forall(_.kNulls >= 0)
      else if (isStrRef(n)) meta.forall(_.sNulls >= 0)
      else fieldOf(n).exists(f =>
        f.dataType == LongType || f.dataType == StringType ||
          f.dataType == org.apache.spark.sql.types.TimestampType) &&
        meta.forall(p => p.rows == 0 ||
          p.cstats.get(n).exists(_.nulls >= 0))
    // SUM(col) answers from the writer's exact per-part sums — key
    // column from [[PartMeta.kSum]], secondary longs from
    // [[ColStat.sum]]; a part written before sum tracking (or whose
    // own sum overflowed) declines
    def sumAnswerable(n: String): Boolean =
      if (isKeyRef(n)) meta.forall(p => p.rows == 0 || p.kSum.isDefined)
      else fieldOf(n).exists(_.dataType == LongType) &&
        meta.forall(p => p.rows == 0 ||
          p.cstats.get(n).exists(_.sum.isDefined))
    val ok = a.aggregateExpressions.forall {
      case _: CountStar => groupNames.isEmpty || !anyDv
      case m: Min => name(m.column).exists(statAnswerable) && !anyDv
      case m: Max => name(m.column).exists(statAnswerable) && !anyDv
      case c: Count =>
        !c.isDistinct && name(c.column).exists(countAnswerable) && !anyDv
      case s: Sum =>
        !s.isDistinct && name(s.column).exists(sumAnswerable) && !anyDv
      case _ => false
    }
    if (!ok) return None

    // ---- fold final values per group of parts
    def foldMM(g: Seq[PartMeta], c: String, wantMin: Boolean): Any =
      if (isKeyRef(c)) {
        val withKeys = g.filter(p => p.kMin <= p.kMax)
        if (withKeys.isEmpty) null
        else java.lang.Long.valueOf(
          if (wantMin) withKeys.map(_.kMin).min else withKeys.map(_.kMax).max)
      } else if (isStrRef(c)) {
        val withStr = g.filter(_.sMin.isDefined)
        if (withStr.isEmpty) null
        else if (wantMin) withStr.map(_.sMin.get).reduce(StrBin.min)
        else withStr.map(_.sMax.get).reduce(StrBin.max)
      } else {
        val st = g.flatMap(_.cstats.get(c))
        if (st.isEmpty) null
        else if (st.head.kind == 's') {
          if (wantMin) st.map(_.min).reduce(StrBin.min)
          else st.map(_.max).reduce(StrBin.max)
        } else java.lang.Long.valueOf(
          if (wantMin) st.map(_.lMin).min else st.map(_.lMax).max)
      }
    def countNonNull(g: Seq[PartMeta], c: String): Long = g.map { p =>
      if (isKeyRef(c)) p.rows - math.max(0L, p.kNulls)
      else if (isStrRef(c)) p.rows - math.max(0L, p.sNulls)
      else p.cstats.get(c).map(st => p.rows - math.max(0L, st.nulls))
        .getOrElse(0L)
    }.sum
    // SQL SUM is NULL iff zero non-null inputs — provable without
    // null counts: a part saw a non-null value iff it recorded stats
    def foldSum(g: Seq[PartMeta], c: String): Any = {
      val any =
        if (isKeyRef(c)) g.exists(p => p.kMin <= p.kMax)
        else g.exists(_.cstats.contains(c))
      if (!any) null
      else java.lang.Long.valueOf(g.foldLeft(0L) { (acc, p) =>
        val s = if (isKeyRef(c)) p.kSum.getOrElse(0L)
          else p.cstats.get(c).flatMap(_.sum).getOrElse(0L)
        Math.addExact(acc, s) // overflow → decline via the catch below
      })
    }
    def groupRow(key: Seq[Any], g: Seq[PartMeta]): Array[Any] =
      (key ++ a.aggregateExpressions.toSeq.map[Any] {
        // visibleRows: a deletion vector reduces the served count
        // with no data rewrite — the global metadata COUNT(*) stays
        // EXACT under MOR deletes
        case _: CountStar => java.lang.Long.valueOf(g.map(_.visibleRows).sum)
        case m: Min => foldMM(g, name(m.column).get, wantMin = true)
        case m: Max => foldMM(g, name(m.column).get, wantMin = false)
        case c: Count =>
          java.lang.Long.valueOf(countNonNull(g, name(c.column).get))
        case s: Sum => foldSum(g, name(s.column).get)
        case f => throw new IllegalStateException(s"unexpected pushed agg $f")
      }).toArray
    // the folds run INSIDE the try: a SUM whose total overflows a
    // Long throws addExact and the whole answer declines to a scan
    val rows: Seq[Array[Any]] =
      try {
        if (groupNames.isEmpty) Seq(groupRow(Seq.empty, meta))
        else live.groupBy(p => groupNames.map(c => groupValue(p, c).get))
          .toSeq.map { case (k, g) => groupRow(k, g) }
      } catch { case _: ArithmeticException => return None }
    val outSchema = StructType(
      groupNames.zipWithIndex.map { case (c, i) =>
        StructField(s"g_$i", fieldOf(c).get.dataType, nullable = true)
      } ++ a.aggregateExpressions.zipWithIndex.map {
        case (_: CountStar, i) =>
          StructField(s"agg_$i", LongType, nullable = false)
        case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
        case (_: Sum, i)   => StructField(s"agg_$i", LongType, nullable = true)
        case (f, i) =>
          val mmCol = f match {
            case m: Min => name(m.column).get
            case m: Max => name(m.column).get
            case _ => return None
          }
          StructField(s"agg_$i", fieldOf(mmCol).get.dataType, nullable = true)
      })
    Some((outSchema, rows))
  }

  override def supportCompletePushDown(a: Aggregation): Boolean = canPushAgg(a)
  override def pushAggregation(a: Aggregation): Boolean =
    metaAggAnswer(a) match {
      case Some(r) => aggResult = Some(r); true
      case None => false
    }

  /** LIMIT pushdown: plan only a prefix of parts whose manifest row
    * counts cover the limit, and cap each reader at `n` rows (any one
    * partition can satisfy at most the whole limit). Spark only pushes
    * a limit here when nothing filters between scan and limit, so the
    * prefix is sufficient; the default isPartiallyPushed=true keeps
    * Spark's own final limit in the plan. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  // PARTIAL TopN pushdown (`ORDER BY key LIMIT k` on an ordered
  // layout): accepted only as a PART-PRUNING hint — isPartiallyPushed
  // stays true, so Spark keeps its Sort+Limit above the scan and
  // correctness never rests on the prune. When the planned parts are
  // all writer-certified key-sorted with PAIRWISE-DISJOINT key ranges
  // (CLUSTER BY / WRITE ORDERED layouts — the ranges a compacted
  // ordered table records) and exact visible counts, build() keeps
  // only the boundary prefix whose visible rows cover k: `ORDER BY k
  // LIMIT 10` on a 100k-part table opens O(1) parts instead of
  // sorting the table. Any ineligible part set (unsorted, overlapping,
  // pending equality deletes, empty) just declines the prune.
  private var topN: Option[(Boolean, Int)] = None
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    if (orders.length != 1 || n <= 0 || keyCol.isEmpty || cdf ||
        rowLevelOwner.nonEmpty) return false
    val o = orders(0)
    val colName = o.expression() match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
          if nr.fieldNames().length == 1 => nr.fieldNames()(0)
      case _ => return false
    }
    // only the stats key column carries the per-part (min, max) the
    // prune reasons over; eligibility implies no null keys exist
    // (the writer never certifies a part with null keys as sorted),
    // so the null ordering is vacuous
    if (!keyCol.get.equalsIgnoreCase(colName)) return false
    topN = Some((o.direction() ==
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING, n))
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** Accept range/point predicates on the key column for part pruning;
    * report every filter as residual (Spark re-evaluates row-level). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (filters.nonEmpty) sawFilters = true
    def isKey(c: String) = keyCol.contains(c)
    filters.foreach {
      case IsNull(c)    => isNullCols += c
      case IsNotNull(c) => notNullCols += c
      case GreaterThan(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, if (v == Long.MaxValue) v else v + 1)
      case GreaterThanOrEqual(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, v)
      case LessThan(c, v: Long) if isKey(c) =>
        keyHi = math.min(keyHi, if (v == Long.MinValue) v else v - 1)
      case LessThanOrEqual(c, v: Long) if isKey(c) =>
        keyHi = math.min(keyHi, v)
      case EqualTo(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, v); keyHi = math.min(keyHi, v)
        addPoints(Set(v))
      // <=> with a NON-NULL literal is exactly = for pruning (it
      // matches only that value; `c <=> NULL` arrives with a null
      // operand, never matches `v: Long`, and stays unpruned)
      case EqualNullSafe(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, v); keyHi = math.min(keyHi, v)
        addPoints(Set(v))
      case In(c, vs) if isKey(c) && vs.nonEmpty =>
        val longs = vs.collect { case v: Long => v }
        if (longs.length == vs.length) { // only prune when ALL values are typed
          keyLo = math.max(keyLo, longs.min); keyHi = math.min(keyHi, longs.max)
          addPoints(longs.toSet)
        }
      // string-column bounds against the smin/smax part stats. ALL
      // comparisons — intersecting bounds here and checking stats in
      // strOverlaps — go through StrBin (UTF-8 byte order, the
      // writer's collation); Java String order (UTF-16 code units)
      // would disagree on supplementary characters and could prune a
      // part that holds matching rows. Open bounds stay open: GT/LT
      // keep the boundary value in the PRUNING range — row-exactness
      // is the residual filter's job, exclusion only needs "can't
      // overlap".
      case EqualTo(c, v: String) if strCol.contains(c) =>
        strLo = Some(strLo.fold(v)(StrBin.max(v, _)))
        strHi = Some(strHi.fold(v)(StrBin.min(v, _)))
        addStrPoints(c, Set(v))
      case EqualNullSafe(c, v: String) if strCol.contains(c) =>
        strLo = Some(strLo.fold(v)(StrBin.max(v, _)))
        strHi = Some(strHi.fold(v)(StrBin.min(v, _)))
        addStrPoints(c, Set(v))
      case GreaterThan(c, v: String) if strCol.contains(c) =>
        strLo = Some(strLo.fold(v)(StrBin.max(v, _)))
      case GreaterThanOrEqual(c, v: String) if strCol.contains(c) =>
        strLo = Some(strLo.fold(v)(StrBin.max(v, _)))
      case LessThan(c, v: String) if strCol.contains(c) =>
        strHi = Some(strHi.fold(v)(StrBin.min(v, _)))
      case LessThanOrEqual(c, v: String) if strCol.contains(c) =>
        strHi = Some(strHi.fold(v)(StrBin.min(v, _)))
      case In(c, vs) if strCol.contains(c) && vs.nonEmpty =>
        val strs = vs.collect { case v: String => v }
        if (strs.length == vs.length) {
          val mn = strs.reduce(StrBin.min)
          val mx = strs.reduce(StrBin.max)
          strLo = Some(strLo.fold(mn)(StrBin.max(mn, _)))
          strHi = Some(strHi.fold(mx)(StrBin.min(mx, _)))
          // the DISCRETE set too: a [min..max] range over an IN list
          // admits every lexically-between value ('error' sits inside
          // ['click','view']) — on a value-split layout the point set
          // is what prunes to exactly the named values' parts
          strInSet = Some(strInSet.fold(strs.toSet)(_ intersect strs.toSet))
          addStrPoints(c, strs.toSet)
        }
      // LIKE 'p%' — every match is >= p, and (when the last char can
      // increment byte-safely) < p-with-last-char-incremented, so an
      // INCLUSIVE hi of that successor is a conservative superset
      case StringStartsWith(c, v) if strCol.contains(c) && v.nonEmpty =>
        strLo = Some(strLo.fold(v)(StrBin.max(v, _)))
        prefixUpper(v).foreach(u =>
          strHi = Some(strHi.fold(u)(StrBin.min(u, _))))
      case StringStartsWith(c, v) if v.nonEmpty =>
        cStrLo += c -> cStrLo.get(c).fold(v)(StrBin.max(v, _))
        prefixUpper(v).foreach(u =>
          cStrHi += c -> cStrHi.get(c).fold(u)(StrBin.min(u, _)))
      // every OTHER long/string column: intersect into the
      // generalized bound maps, pruned against per-part ColStats.
      // Open long bounds tighten by ±1 exactly like the key column's;
      // open string bounds stay closed-for-pruning (exclusion only
      // needs "can't overlap" — row exactness is the residual's job)
      case GreaterThan(c, v: Long) =>
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue),
          if (v == Long.MaxValue) v else v + 1)
      case GreaterThanOrEqual(c, v: Long) =>
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), v)
      case LessThan(c, v: Long) =>
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue),
          if (v == Long.MinValue) v else v - 1)
      case LessThanOrEqual(c, v: Long) =>
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), v)
      case EqualTo(c, v: Long) =>
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), v)
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), v)
      case EqualNullSafe(c, v: Long) =>
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), v)
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), v)
      case In(c, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Long]) =>
        val longs = vs.map(_.asInstanceOf[Long])
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), longs.min)
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), longs.max)
      case EqualTo(c, v: String) =>
        cStrLo += c -> cStrLo.get(c).fold(v)(StrBin.max(v, _))
        cStrHi += c -> cStrHi.get(c).fold(v)(StrBin.min(v, _))
        addStrPoints(c, Set(v))
      case EqualNullSafe(c, v: String) =>
        cStrLo += c -> cStrLo.get(c).fold(v)(StrBin.max(v, _))
        cStrHi += c -> cStrHi.get(c).fold(v)(StrBin.min(v, _))
        addStrPoints(c, Set(v))
      case GreaterThan(c, v: String) =>
        cStrLo += c -> cStrLo.get(c).fold(v)(StrBin.max(v, _))
      case GreaterThanOrEqual(c, v: String) =>
        cStrLo += c -> cStrLo.get(c).fold(v)(StrBin.max(v, _))
      case LessThan(c, v: String) =>
        cStrHi += c -> cStrHi.get(c).fold(v)(StrBin.min(v, _))
      case LessThanOrEqual(c, v: String) =>
        cStrHi += c -> cStrHi.get(c).fold(v)(StrBin.min(v, _))
      case In(c, vs) if vs.nonEmpty &&
          vs.forall(_.isInstanceOf[String]) =>
        val strs = vs.map(_.asInstanceOf[String])
        val mn = strs.reduce(StrBin.min)
        val mx = strs.reduce(StrBin.max)
        cStrLo += c -> cStrLo.get(c).fold(mn)(StrBin.max(mn, _))
        cStrHi += c -> cStrHi.get(c).fold(mx)(StrBin.min(mx, _))
        addStrPoints(c, strs.toSet)
      // TIMESTAMP columns: filter values arrive as java.sql.Timestamp
      // or java.time.Instant (java8API) — convert to the micros the
      // writer's 'l' ColStat leg recorded and intersect into the same
      // long bound maps. Range pruning on a days()/hours() split
      // layout plans exactly the covered ordinals' parts this way
      // (each part's micros range lives inside one ordinal). Open
      // bounds stay closed-for-pruning: micros granularity makes the
      // off-by-one irrelevant for exclusion, and the filters remain
      // residual (row exactness is Spark's post-filter). Open bounds
      // tighten by the 1-micro step exactly like the long columns' —
      // `ts < DAY-BOUNDARY` must NOT keep the boundary day's part.
      case GreaterThan(c, v) if tsMicros(v).isDefined =>
        val m = tsMicros(v).get
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue),
          if (m == Long.MaxValue) m else m + 1)
      case GreaterThanOrEqual(c, v) if tsMicros(v).isDefined =>
        val m = tsMicros(v).get
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), m)
      case LessThan(c, v) if tsMicros(v).isDefined =>
        val m = tsMicros(v).get
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue),
          if (m == Long.MinValue) m else m - 1)
      case LessThanOrEqual(c, v) if tsMicros(v).isDefined =>
        val m = tsMicros(v).get
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), m)
      case EqualTo(c, v) if tsMicros(v).isDefined =>
        val m = tsMicros(v).get
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), m)
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), m)
      case In(c, vs) if vs.nonEmpty &&
          vs.forall(v => tsMicros(v).isDefined) =>
        val ms = vs.map(v => tsMicros(v).get)
        cLongLo += c -> math.max(cLongLo.getOrElse(c, Long.MinValue), ms.min)
        cLongHi += c -> math.min(cLongHi.getOrElse(c, Long.MaxValue), ms.max)
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThan(c, _: Long)        => isKey(c)
      case GreaterThanOrEqual(c, _: Long) => isKey(c)
      case LessThan(c, _: Long)           => isKey(c)
      case LessThanOrEqual(c, _: Long)    => isKey(c)
      case EqualTo(c, _: Long)            => isKey(c)
      case In(c, _)                       => isKey(c)
      case _                              => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Byte-safe successor of a prefix for upper-bound pruning: only
    * when the last char is ASCII below 0x7F does incrementing it stay
    * a single-byte UTF-8 step (no surrogate/encoding hazards); other
    * prefixes just skip the upper bound — lo-only pruning is still
    * sound. */
  private def prefixUpper(v: String): Option[String] =
    if (v.nonEmpty && v.last < 0x7F) Some(v.init + (v.last + 1).toChar)
    else None

  private def addPoints(vs: Set[Long]): Unit =
    points = Some(points.fold(vs)(_ intersect vs))

  /** A pushed-filter timestamp value as epoch MICROS — the exact
    * representation the writer's stats recorded. Spark hands
    * java.sql.Timestamp by default and java.time.Instant under the
    * java8 datetime API; both convert losslessly. Anything else is
    * not a timestamp predicate. */
  private def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant => Some(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case _ => None
  }

  override def build(): Scan = {
    // change-feed reads bypass the batch machinery entirely: the
    // stream plans snapshot DIFFS, not head parts (filters stay
    // residual — Spark re-applies them on the emitted change rows)
    if (cdf) {
      val base = StructType(schema.fields.filterNot(f =>
        ManifestCdf.MetaNames.contains(f.name)))
      return new ManifestCdfScan(path, base, required, conf,
        startingVersion, maxPartsPerTrigger,
        colMapIdsFor(base,
          ManifestSink.readSchemaAndColMap(conf.value, path)))
    }
    // plan against the manifest on the DRIVER: only committed parts,
    // and only those whose key range can intersect [keyLo, keyHi].
    // Null-key rows are safe to skip under a key predicate (three-
    // valued logic: no key comparison is ever TRUE for NULL), and a
    // part whose keys are all NULL carries the (MaxValue, MinValue)
    // sentinel, so any real bound prunes it; with no pushed bounds
    // nothing is pruned.
    //
    // The head version is resolved HERE and the meta read PINNED to
    // it, so the (part list, base version) pair a row-level rewrite
    // records is one consistent snapshot — resolving the version at
    // execution time could capture a commit that landed after this
    // plan and void the strictBase lost-update guard.
    val (all, baseVersion, snapCm) = branch match {
      case Some(b) =>
        // pin the BRANCH head version the same way the main line is
        // pinned: a branch-routed row-level rewrite records (parts,
        // branch version) as one consistent snapshot, so its commit's
        // strictBase guards the branch line, not a meaningless 0
        val latest = ManifestSink.listBranchVersions(conf.value, path, b)
          .lastOption.getOrElse(0)
        val (m, sc) = ManifestSink.readSnapshot(conf.value, path,
          if (latest == 0) None else Some(latest), Some(b))
        (m, latest, sc)
      case None => version match {
        case Some(v) =>
          val (m, sc) = ManifestSink.readSnapshot(conf.value, path, version)
          (m, v, sc)
        case None =>
          val latest = ManifestSink.listVersions(conf.value, path)
            .lastOption.getOrElse(0)
          val (m, sc) = ManifestSink.readSnapshot(conf.value, path,
            if (latest == 0) None else Some(latest))
          (m, latest, sc)
      }
    }
    aggResult match {
      case Some((aggSchema, aggRows)) =>
        new ManifestAggScan(aggSchema, aggRows)
      case None =>
        var kept = all.filter(m => !(m.kMax < keyLo || m.kMin > keyHi))
        if (strLo.isDefined || strHi.isDefined)
          kept = kept.filter(_.strOverlaps(strLo, strHi))
        // discrete IN-set pruning: survive only if SOME listed value
        // can live in the part (point-overlap per value) — on a
        // value-split layout this plans exactly the named values'
        // parts where the folded range would keep everything between
        strInSet.foreach { vals =>
          kept = kept.filter(m =>
            vals.exists(s => m.strOverlaps(Some(s), Some(s))))
        }
        // generalized column pruning: a part survives unless SOME
        // bounded column has a recorded stat that proves no overlap
        // (absent stat ⇒ keep; kind mismatch ⇒ keep — never wrong)
        if (cLongLo.nonEmpty || cLongHi.nonEmpty ||
            cStrLo.nonEmpty || cStrHi.nonEmpty) {
          val longCols = cLongLo.keySet ++ cLongHi.keySet
          val strCols = cStrLo.keySet ++ cStrHi.keySet
          kept = kept.filter { m =>
            longCols.forall { c =>
              m.cstats.get(c) match {
                case Some(st) if st.kind == 'l' =>
                  st.lMax >= cLongLo.getOrElse(c, Long.MinValue) &&
                    st.lMin <= cLongHi.getOrElse(c, Long.MaxValue)
                case _ => true
              }
            } && strCols.forall { c =>
              m.cstats.get(c) match {
                case Some(st) if st.kind == 's' =>
                  cStrLo.get(c).forall(lo => StrBin.cmp(st.max, lo) >= 0) &&
                    cStrHi.get(c).forall(hi => StrBin.cmp(st.min, hi) <= 0)
                case _ => true
              }
            }
          }
        }
        // NULL-COUNT pruning: IS NULL skips parts with provably ZERO
        // nulls in the column; IS NOT NULL skips provably ALL-null
        // parts. Both counts are write-time PHYSICAL (or
        // ANALYZE-refreshed visible) totals — zero physical nulls ⇒
        // zero visible nulls, all physical null ⇒ all visible null,
        // so the skip stays sound under deletion vectors; unknown
        // (-1, legacy manifests) never prunes.
        if (isNullCols.nonEmpty || notNullCols.nonEmpty) {
          def nullsFor(m: PartMeta, c: String): Long =
            if (keyCol.contains(c)) m.kNulls
            else if (strCol.contains(c)) m.sNulls
            else m.cstats.get(c).map(_.nulls).getOrElse(-1L)
          kept = kept.filter { m =>
            isNullCols.forall(c => nullsFor(m, c) != 0L) &&
              notNullCols.forall { c =>
                val n = nullsFor(m, c)
                !(n >= 0 && m.rows > 0 && n >= m.rows)
              }
          }
        }
        // point predicates additionally consult the per-part bloom: a
        // part whose range admits v but whose bloom proves v absent
        // is skipped (hash-layout tables prune here, not on min/max)
        points.foreach { ps =>
          kept = kept.filter(m => ps.exists(m.mayContain))
        }
        // SECONDARY-COLUMN BLOOMS: a string point lookup on a
        // declared bloom column (graft.bloom_cols) skips every part
        // whose filter proves all values absent — the only pruning
        // that works on high-cardinality strings, where min/max
        // ranges admit nearly every part. Absent bloom (undeclared
        // column, legacy part, all-null part) never prunes.
        if (cStrPoints.nonEmpty) kept = kept.filter { m =>
          cStrPoints.forall { case (c, vs) =>
            m.cstats.get(c) match {
              case Some(st) if st.kind == 's' && st.bloom.nonEmpty =>
                val bits = PartBloom.fromHex(st.bloom)
                vs.exists(v =>
                  PartBloom.mightContain(bits, PartBloom.strKey(v)))
              case _ => true
            }
          }
        }
        limit.foreach { n =>
          // keep the shortest part prefix whose VISIBLE row counts
          // cover n (deletion vectors shrink what a part can supply)
          var need = n.toLong
          kept = kept.takeWhile { p =>
            val take = need > 0; need -= p.visibleRows; take
          }
        }
        // TopN part pruning (see pushTopN): eligible iff every kept
        // part is writer-certified sorted (⇒ no null keys), counts
        // are exact (no pending equality deletes), and key ranges are
        // pairwise disjoint once ordered — then the boundary prefix
        // covering n visible rows provably contains a complete top-n
        // (every omitted row's key is ≥/≤ all prefix keys). Spark's
        // retained Sort+Limit finishes the job, so a decline is only
        // ever slower, never wrong.
        topN.foreach { case (asc, n) =>
          val ordered = kept.sortBy(_.kMin)
          val eligible = kept.nonEmpty &&
            kept.forall(p => p.sorted && p.countsExact) &&
            ordered.sliding(2).forall {
              case Seq(a, b) => a.kMax <= b.kMin
              case _ => true
            }
          if (eligible) {
            var need = n.toLong
            kept = (if (asc) ordered else ordered.reverse).takeWhile { p =>
              val take = need > 0; need -= p.visibleRows; take
            }
          }
        }
        new ManifestScan(kept, schema, required, conf, all.size, limit, keyCol,
          path, rowLevelOwner, startingVersion, baseVersion,
          maxPartsPerTrigger, ids = colMapIdsFor(schema, snapCm),
          branched = branch.isDefined,
          initDefaults = ColDefaults.byName(schema, snapCm),
          nestedIds = ManifestSource.nestedIdsFor(snapCm))
    }
  }

  /** Field ids aligned to `s` from the pinned snapshot's column
    * mapping (empty = identity — the overwhelmingly common case,
    * where the reader skips mapping entirely). Aligned by NAME
    * against the snapshot schema the mapping was committed with —
    * robust to meta-column additions on `s`. */
  private def colMapIdsFor(s: StructType,
      snapCm: Option[(StructType, ColMap)]): Seq[Int] =
    snapCm match {
      case Some((snap, cm)) if !cm.isIdentity =>
        val byName = snap.fields.map(_.name).zip(cm.ids).toMap
        s.fields.toSeq.map { f =>
          if (f.name == PartMetaColumn.Name || f.name == PosMetaColumn.Name)
            -1 // metadata columns are served from the partition, not a slot
          else byName.getOrElse(f.name,
            throw new IllegalStateException(
              s"column '${f.name}' has no field id in the snapshot " +
                s"mapping of $path"))
        }
      case _ => Seq.empty
    }
}

/** Metadata-only scan: the FINAL aggregate rows were already computed
  * on the driver from one manifest read (see `computeMetaAgg`) — the
  * scan just serves them; no data file is ever opened. A global
  * aggregate is one partition/one row; a grouped aggregate chunks its
  * group rows (one per distinct part-constant value) across a few
  * partitions, each a thin array in the task closure. */
private[sources] class ManifestAggScan(
    aggSchema: StructType, rows: Seq[Array[Any]])
    extends Scan with Batch {

  override def toBatch: Batch = this
  override def description(): String =
    s"graft.ManifestAggScan(metadata-only, ${rows.length} rows, " +
      aggSchema.fieldNames.mkString(", ") + ")"

  override def readSchema(): StructType = aggSchema

  override def planInputPartitions(): Array[InputPartition] =
    if (rows.isEmpty) Array.empty
    else rows.grouped(4096).map(c => ManifestAggPartition(c.toArray)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val all = p.asInstanceOf[ManifestAggPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < all.length }
          override def get(): InternalRow =
            new GenericInternalRow(all(i).map[Any] {
              case null             => null
              case s: String       =>
                org.apache.spark.unsafe.types.UTF8String.fromString(s)
              case l: java.lang.Long => l.longValue()
            })
          override def close(): Unit = ()
        }
    }
}

private[sources] case class ManifestAggPartition(rows: Array[Array[Any]])
    extends InputPartition

private[sources] class ManifestScan(
    initialParts: Seq[PartMeta],
    schema: StructType, required: StructType,
    conf: SerializableConfiguration, totalParts: Int,
    limit: Option[Int] = None, keyCol: Option[String] = None,
    tablePath: String = "",
    rowLevelOwner: Option[ManifestRowLevelOp] = None,
    startingVersion: Option[Int] = None,
    baseVersion: Int = 0,
    maxPartsPerTrigger: Option[Int] = None,
    ids: Seq[Int] = Seq.empty,
    branched: Boolean = false,
    initDefaults: Map[String, Any] = Map.empty,
    nestedIds: Map[Int, Seq[Int]] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  /** For [[SplitRowLevelDpp]]: the stats-keyed column (bloom + range
    * pruning) and whether this scan drives a row-level rewrite. */
  private[sources] def keyColName: Option[String] = keyCol
  private[sources] def isRowLevelScan: Boolean = rowLevelOwner.isDefined

  /** The table directory this scan reads, regardless of pin flags —
    * for [[MvRewrite.readsManifestDir]]'s structural routing probe. */
  private[sources] def scanTableDir: String = tablePath

  /** SORT-FREE reads: each input partition is one part file, and the
    * writer DETECTED whether it streamed out key-sorted (monotone
    * non-decreasing, no null keys — recorded in the manifest), so
    * when every planned part is sorted — and, under KeyGrouped
    * reporting, no bucket holds two files whose concatenation would
    * break the order — the scan reports per-partition ordering on
    * the key. A co-bucketed join of compacted tables then runs with
    * NO exchange AND NO sort: pure zip-merge, the cheapest join
    * Spark can plan. Requires
    * spark.sql.sources.v2.bucketing.sorting.enabled. */
  override def outputOrdering():
      Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val allSorted = parts.nonEmpty && keyCol.isDefined &&
      rowLevelOwner.isEmpty && parts.forall(_.sorted)
    val spec = parts.headOption.map(_.nbuckets).getOrElse(0)
    val keyGrouped = spec > 0 &&
      parts.forall(p => p.nbuckets == spec && p.bucket >= 0)
    val oneFilePerGroup =
      !keyGrouped || parts.groupBy(_.bucket).forall(_._2.size == 1)
    if (allSorted && oneFilePerGroup)
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions
          .column(keyCol.get),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    else Array.empty
  }

  /** STORAGE-PARTITIONED reads: when every planned part carries a
    * consistent bucket spec (written with `option("buckets", n)`),
    * report `KeyGroupedPartitioning(bucket(n, key))` — Spark then
    * groups the parts by bucket ordinal, and (a) an aggregation on
    * the key runs with NO exchange (each bucket holds all rows of its
    * keys), (b) a join of two co-bucketed tables on the key zips the
    * bucket partitions pairwise with NO shuffle on either side — the
    * Iceberg storage-partitioned-join shape, and at 100 TB the
    * difference between "join = full-table exchange" and "join =
    * co-located merge". The transform resolves through the catalog's
    * `bucket` function ([[GraftBucketFunction]]), whose identity with
    * the writer's router is what makes the claim sound. A single
    * rewritten/compacted part without bucket metadata demotes the
    * scan to UnknownPartitioning — correctness never rests on the
    * report. Requires spark.sql.sources.v2.bucketing.enabled. */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val spec = parts.headOption.map(_.nbuckets).getOrElse(0)
    val bucketed = spec > 0 && keyCol.isDefined && rowLevelOwner.isEmpty &&
      parts.forall(p => p.nbuckets == spec && p.bucket >= 0)
    if (bucketed)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .bucket(spec, keyCol.get)),
        parts.map(_.bucket).distinct.size)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        parts.size)
  }

  /** (table dir, pinned base version) when this scan is a plain,
    * un-limited batch read of one committed snapshot — the only shape
    * [[MvRewrite]] may substitute with a materialized rollup. Every
    * narrowing the scan could have absorbed silently is excluded
    * structurally: LIMIT prefixes (limit), row-level rewrite scans
    * (rowLevelOwner), stream tails (startingVersion); pushed FILTERS
    * need no flag because this source reports all filters residual,
    * so a filtered query always keeps a Filter node above the scan
    * relation and the rewrite's adjacency match fails. */
  private[sources] def mvRewriteTarget: Option[(String, Int)] =
    if (tablePath.nonEmpty && limit.isEmpty && rowLevelOwner.isEmpty &&
      startingVersion.isEmpty && !branched) Some((tablePath, baseVersion))
    else None

  /** Streaming read: snapshot versions ARE the offsets (see
    * [[ManifestMicroBatchStream]]); the stream shares this scan's
    * pruned column set, so `readStream.select(...)` still prunes the
    * line decoder. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ManifestMicroBatchStream(tablePath, schema, required, conf,
      startingVersion, maxPartsPerTrigger, ids)

  // narrowed in place by runtime filters before partition planning
  private var parts: Seq[PartMeta] = initialParts

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.ManifestScan(parts=${parts.size}/$totalParts" +
      limit.map(n => s", limit=$n").getOrElse("") + ")"

  /** RUNTIME part pruning — the DSv2 analog of dynamic partition
    * pruning: when this table is the probe side of a broadcast join
    * on the key, Spark hands the build side's key set here AT
    * EXECUTION TIME and only parts whose manifest (min, max) range
    * can contain one of those keys are ever opened. Static planning
    * cannot see the join's key set; at 100 TB a selective dimension
    * turns a full fact scan into a handful of parts. Dropping a part
    * no build key can hit is safe by construction (Spark injects the
    * filter only where join semantics allow); the row-level join
    * still decides every surviving row.
    *
    * Advertised ONLY when the key survived column pruning: Spark's
    * PartitionPruning resolves these refs against the scan's PRUNED
    * output and throws on a miss — a scan projecting (event_type,
    * value) out of a keyed table must simply decline runtime
    * filtering, not break the query. */
  /** Runtime (DPP-style) pruning is advertised for every column the
    * manifest can answer membership for: the key (range + bloom), the
    * primary string column (smin/smax), and any column some planned
    * part carries a [[ColStat]] for — a star join filtering on ANY
    * stats-tracked dimension column narrows the fact scan at
    * execution. Only columns surviving column pruning are advertised
    * (advertising a pruned-away column makes Spark's PartitionPruning
    * throw at resolution — pinned by ManifestSourceSpec). */
  override def filterAttributes(): Array[NamedReference] = {
    val strCol = schema.fields.find(_.dataType == StringType).map(_.name)
    val statCols = initialParts.iterator.flatMap(_.cstats.keysIterator)
      .distinct.toSeq
    (keyCol.toSeq ++ strCol.toSeq ++ statCols).distinct
      .filter(required.fieldNames.contains)
      .map(c => Expressions.column(c)).toArray
  }

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    // runtime key sets are point sets, so the per-part bloom applies
    // on top of the (min, max) range — mayContain checks both
    case In(c, vs) if keyCol.contains(c) =>
      val longs = vs.collect { case v: Long => v }
      if (longs.length == vs.length) // only prune on fully-typed sets
        parts = parts.filter(p => longs.exists(p.mayContain))
    case EqualTo(c, v: Long) if keyCol.contains(c) =>
      parts = parts.filter(_.mayContain(v))
    case In(c, vs) if vs.nonEmpty &&
        schema.fields.find(_.dataType == StringType).map(_.name).contains(c) =>
      val strs = vs.collect { case v: String => v }
      if (strs.length == vs.length)
        parts = parts.filter(p =>
          strs.exists(s => p.strOverlaps(Some(s), Some(s))))
    case In(c, vs) if vs.nonEmpty =>
      // secondary columns: point-set membership against the ColStat
      // range; a part with no entry is kept (absent ⇒ cannot prune)
      if (vs.forall(_.isInstanceOf[Long])) {
        val longs = vs.map(_.asInstanceOf[Long])
        parts = parts.filter(p => p.cstats.get(c) match {
          case Some(st) if st.kind == 'l' =>
            longs.exists(v => v >= st.lMin && v <= st.lMax)
          case _ => true
        })
      } else if (vs.forall(_.isInstanceOf[String])) {
        val strs = vs.map(_.asInstanceOf[String])
        parts = parts.filter(p => p.cstats.get(c) match {
          case Some(st) if st.kind == 's' =>
            strs.exists(s => StrBin.cmp(st.min, s) <= 0 &&
              StrBin.cmp(st.max, s) >= 0)
          case _ => true
        })
      }
    case _ => ()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // a row-level rewrite's commit must replace EXACTLY the parts its
    // scan planned (post static + runtime pruning) — record them on
    // the shared operation before tasks launch, paired with the base
    // version the part list was read at (same head read, see build())
    rowLevelOwner.foreach(_.recordScan(parts, baseVersion))
    parts.map(p =>
      ManifestPartition(p.path, p.rows, p.dvHex, p.dvRef, p.bucket,
        p.cols, EqClause.encode(p.eq), p.ncols)).toArray
  }

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PartsPlannedMetric, new PartsSkippedMetric,
      new DvMaskedRowsMetric, new EqMaskedRowsMetric)

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(LongTaskMetric("partsPlanned", parts.size.toLong),
      LongTaskMetric("partsSkipped", (totalParts - parts.size).toLong))

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema, required, conf,
      limit.map(_.toLong).getOrElse(Long.MaxValue), ids, initDefaults,
      nestedIds)

  /** Post-pruning stats straight from the manifest — exact row count;
    * bytes from the parts' TRUE on-disk sizes (committed with each
    * part), scaled by the projected-column fraction and the visible
    * fraction under deletion vectors. This is what lets the planner
    * flip a pruned fact scan to the BROADCAST side of a join purely
    * from manifest metadata: a predicate that prunes 100k parts down
    * to three reports three parts' bytes, not a table-wide width
    * guess (ScaleSpec pins the SMJ→BHJ flip). Parts predating the
    * bytes field fall back to the width estimate — over-estimating
    * never breaks a plan, it only declines the broadcast. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = parts.map(_.visibleRows).sum
    private val colFraction =
      math.min(1.0, required.defaultSize.toDouble /
        math.max(1, schema.defaultSize))
    override def sizeInBytes(): OptionalLong = OptionalLong.of(math.max(1L,
      parts.map { p =>
        if (p.bytes > 0)
          (p.bytes * colFraction *
            (p.visibleRows.toDouble / math.max(1L, p.rows))).toLong
        else p.visibleRows * required.defaultSize
      }.sum))
    override def numRows(): OptionalLong = OptionalLong.of(n)
    // ANALYZE-collected NDV (graft.ndv props, O(1) read) + EXACT null
    // counts folded from this scan's planned parts — the column stats
    // Spark's CBO needs to size join outputs (JoinEstimation) and
    // reorder a multi-join chain (CostBasedJoinReorder under
    // spark.sql.cbo.enabled). NDV is capped at the post-pruning row
    // count; columns without an ANALYZE pass report nothing.
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val out = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (tablePath.isEmpty) return out
      val strName = schema.fields
        .find(_.dataType == org.apache.spark.sql.types.StringType)
        .map(_.name)
      def nullsFor(c: String): Long = {
        def fold(get: PartMeta => Long): Long =
          if (parts.exists(p => get(p) < 0)) -1L else parts.map(get).sum
        if (keyCol.contains(c)) fold(_.kNulls)
        else if (strName.contains(c)) fold(_.sNulls)
        else fold(_.cstats.get(c).map(_.nulls).getOrElse(-1L))
      }
      // LONG-column [min, max] folded from this scan's planned parts:
      // JoinEstimation intersects key ranges before applying the NDV
      // formula — without them it cannot size a join at all
      def rangeFor(c: String): Option[(Long, Long)] = {
        val bounds: Seq[(Long, Long)] =
          if (keyCol.contains(c))
            parts.collect { case p if p.rows > 0 && p.kMin <= p.kMax =>
              (p.kMin, p.kMax) }
          else parts.flatMap(_.cstats.get(c))
            .collect { case st if st.kind == 'l' => (st.lMin, st.lMax) }
        if (bounds.isEmpty) None
        else Some((bounds.map(_._1).min, bounds.map(_._2).max))
      }
      // ANALYZE-collected equi-depth histograms (graft.hist props):
      // per-bin ndv is what FilterEstimation needs to size a RANGE
      // predicate on a SKEWED column — NDV + [min,max] alone assume
      // uniformity. transformV2Stats converts these bins verbatim
      // into the catalyst Histogram the estimator reads.
      val hists = ManifestSink.readHist(conf.value, tablePath)
      ManifestSink.readNdv(conf.value, tablePath).foreach { case (c, d) =>
        if (schema.fields.exists(_.name == c)) {
          val nulls = nullsFor(c)
          val isLong = schema.fields.exists(f =>
            f.name == c &&
              f.dataType == org.apache.spark.sql.types.LongType)
          val range = if (isLong) rangeFor(c) else None
          val hist: Option[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            (if (isLong) hists.get(c) else None).map { case (h, hbins) =>
              new org.apache.spark.sql.connector.read.colstats.Histogram {
                override def height(): Double = h
                override def bins(): Array[
                    org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                  hbins.map { case (blo, bhi, bndv) =>
                    new org.apache.spark.sql.connector.read.colstats
                      .HistogramBin {
                      override def lo(): Double = blo.toDouble
                      override def hi(): Double = bhi.toDouble
                      override def ndv(): Long = bndv
                    }: org.apache.spark.sql.connector.read.colstats
                      .HistogramBin
                  }.toArray
              }
            }
          out.put(
            org.apache.spark.sql.connector.expressions.Expressions.column(c),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount(): OptionalLong =
                OptionalLong.of(math.max(1L, math.min(d, n)))
              override def nullCount(): OptionalLong =
                if (nulls >= 0) OptionalLong.of(nulls)
                else OptionalLong.empty()
              override def min(): java.util.Optional[Object] =
                range.fold(java.util.Optional.empty[Object]())(r =>
                  java.util.Optional.of(java.lang.Long.valueOf(r._1)))
              override def max(): java.util.Optional[Object] =
                range.fold(java.util.Optional.empty[Object]())(r =>
                  java.util.Optional.of(java.lang.Long.valueOf(r._2)))
              override def avgLen(): OptionalLong =
                if (isLong) OptionalLong.of(8L) else OptionalLong.empty()
              override def maxLen(): OptionalLong =
                if (isLong) OptionalLong.of(8L) else OptionalLong.empty()
              override def histogram(): java.util.Optional[
                  org.apache.spark.sql.connector.read.colstats.Histogram] =
                hist.fold(java.util.Optional.empty[
                  org.apache.spark.sql.connector.read.colstats.Histogram]())(
                  java.util.Optional.of(_))
            })
        }
      }
      out
    }
  }
}

/** `dvRef` (sidecar path) wins over inline `dvHex` when both could
  * exist — the reader resolves through [[DeleteVector.load]]'s rule.
  * `bucket` is the part's storage-bucket ordinal (−1 = unbucketed);
  * Spark only consults [[org.apache.spark.sql.connector.read.HasPartitionKey]]
  * when the scan reported KeyGroupedPartitioning, which it does only
  * when EVERY planned part carries a consistent bucket. */
private[sources] case class ManifestPartition(
    path: String, rows: Long, dvHex: String = "", dvRef: String = "",
    bucket: Int = -1, cols: Seq[Int] = Seq.empty, eqBlob: String = "",
    ncols: Map[Int, Seq[Int]] = Map.empty)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Incremental (micro-batch) read over the snapshot log: OFFSETS ARE
  * SNAPSHOT VERSIONS. Batch (start, end] plans exactly the parts that
  * snapshot `end` lists and snapshot `start` did not — the manifest
  * diff, the same algebra the batch changelog (`q_cdc_diff`) exposes.
  * Part files are immutable and manifests are published atomically
  * AFTER their parts, so a version observed by `latestOffset` is
  * always fully readable — no listing races, no partially-visible
  * commits (the property file-glob streaming sources have to
  * approximate with modification times).
  *
  * Semantics are APPEND-DRIVEN, like Delta's streaming reads: parts
  * removed by an overwrite are simply never re-planned (their rows
  * were already delivered from the snapshot that introduced them);
  * rewritten history (vacuumed versions below the checkpointed
  * offset) fails loudly via readManifestMeta rather than silently
  * re-serving the head. AvailableNow and continuous restarts both
  * resume from the checkpointed version offset.
  *
  * At 100 TB this is the ingestion pattern: writers commit snapshots,
  * readers tail the snapshot log and each micro-batch reads only the
  * newly-committed parts — O(new data) per batch, never O(table).
  */
/** Version-granular streaming ADMISSION CONTROL
  * (`option("maxPartsPerTrigger", n)` — the Delta maxFilesPerTrigger
  * analog): a fresh consumer of a 100 TB table must NOT plan the
  * entire backlog as one micro-batch — one giant batch means one
  * giant shuffle, no incremental checkpoints, and a restart that
  * loses everything. With a part budget, `latestOffset(start, limit)`
  * advances the end version only while the cumulative count of
  * newly-added parts stays within the budget — always admitting at
  * least ONE version per trigger (offsets are snapshot versions, so
  * a commit can't be split below version granularity; a single
  * oversized commit still lands whole, exactly like Delta rounding
  * maxFilesPerTrigger up to a full commit). Cost per trigger is one
  * small manifest JSON per admitted version — never data files.
  *
  * Implements SupportsTriggerAvailableNow, so Trigger.AvailableNow
  * pins the end version at query start and then drains it in
  * budgeted batches — the bounded-backfill shape
  * (ManifestStreamSpec pins the batch count; q_stream_backfill
  * gates the rate-limited catch-up end to end). */
private[sources] trait VersionAdmission
    extends org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  protected def admissionPath: String
  protected def admissionConf: SerializableConfiguration
  protected def maxPartsPerTrigger: Option[Int]
  protected def mkOffset(v: Int): Offset
  protected def offsetVersion(o: Offset): Int

  private var availableEnd: Option[Int] = None
  private def headVersion: Int =
    ManifestSink.listVersions(admissionConf.value, admissionPath)
      .lastOption.getOrElse(0)
  private def pathsAt(v: Int): Set[String] =
    if (v == 0) Set.empty
    else ManifestSink.readManifestMeta(admissionConf.value, admissionPath,
      Some(v)).map(_.path).toSet

  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = Some(headVersion)

  override def getDefaultReadLimit: ReadLimit =
    maxPartsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = availableEnd.getOrElse(headVersion)
    val s = offsetVersion(start)
    limit match {
      case f: ReadMaxFiles if s < head =>
        var v = s
        var used = 0
        var prev = pathsAt(s)
        var full = false
        while (!full && v < head) {
          val next = pathsAt(v + 1)
          val added = (next -- prev).size
          // at least one version per batch; beyond that, stop BEFORE
          // the version that would blow the budget
          if (used + added > f.maxFiles && v > s) full = true
          else { used += added; v += 1; prev = next }
        }
        mkOffset(v)
      case _ => mkOffset(head)
    }
  }
}

private[sources] class ManifestMicroBatchStream(
    path: String, schema: StructType, required: StructType,
    conf: SerializableConfiguration, startingVersion: Option[Int] = None,
    protected val maxPartsPerTrigger: Option[Int] = None,
    ids: Seq[Int] = Seq.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with VersionAdmission {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class V(v: Int) extends Offset {
    override def json: String = v.toString
  }
  protected def admissionPath: String = path
  protected def admissionConf: SerializableConfiguration = conf
  protected def mkOffset(v: Int): Offset = V(v)
  protected def offsetVersion(o: Offset): Int = o.asInstanceOf[V].v

  /** Version 0 = "before the first committed snapshot"; a fresh
    * consumer with `option("startingVersion", n)` tails from snapshot
    * n (inclusive) instead of replaying the whole log. Only consulted
    * when no checkpoint exists; resume always wins. */
  override def initialOffset(): Offset =
    V(startingVersion.map(_ - 1).getOrElse(0))

  override def latestOffset(): Offset =
    V(ManifestSink.listVersions(conf.value, path).lastOption.getOrElse(0))

  override def deserializeOffset(json: String): Offset = V(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[V].v
    val e = end.asInstanceOf[V].v
    if (e <= s) return Array.empty
    val before: Set[String] =
      if (s == 0) Set.empty
      else ManifestSink.readManifestMeta(conf.value, path, Some(s)).map(_.path).toSet
    ManifestSink.readManifestMeta(conf.value, path, Some(e))
      .filterNot(m => before.contains(m.path))
      .map(m =>
        ManifestPartition(m.path, m.rows, m.dvHex, m.dvRef,
          cols = m.cols, eqBlob = EqClause.encode(m.eq),
          ncols = m.ncols): InputPartition)
      .toArray
  }

  // ONE colmap snapshot for the stream's whole life, captured with
  // the same head the stream's schema/ids came from: a nested DROP
  // COLUMN committed mid-stream would otherwise shift the HEAD's
  // positional nested ids against this stream's older fixed schema
  // and structPlansFor would misalign sub-slots. EXISTS defaults are
  // frozen at ADD COLUMN, so the pinned view stays valid for every
  // replayed part (nested ids likewise).
  private val snapCm = ManifestSink.readSchemaAndColMap(conf.value, path)

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema, required, conf, ids = ids,
      initDefaults = ColDefaults.byName(schema, snapCm),
      nestedIds = ManifestSource.nestedIdsFor(snapCm))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Option parsing shared by the path table and the catalog table:
  * `startingVersion` maps to initial offset startingVersion-1, so 0
  * (or a negative) would plan readManifestMeta(Some(-1)) on the first
  * trigger and surface as a raw FileNotFoundException — validate at
  * PARSE time with a message that names the option instead. */
private[sources] object StreamOptions {
  def startingVersion(options: CaseInsensitiveStringMap): Option[Int] = {
    val v = Option(options.get("startingVersion")).map(_.toInt)
    v.foreach(n => require(n >= 1,
      s"option 'startingVersion' must be >= 1 (snapshot versions are " +
        s"1-based), got $n"))
    v
  }

  /** `option("startingTimestamp", "yyyy-MM-dd HH:mm:ss[.S]")` — the
    * Delta-shaped time twin of startingVersion: a fresh consumer
    * tails from the EARLIEST snapshot committed at or after the
    * instant (version-file mtime, the same immutable commit clock
    * `TIMESTAMP AS OF` and `expire_snapshots(older_than)` resolve).
    * An instant past the head replays nothing historical and starts
    * with the next commit. Resolved ONCE here — resume from a
    * checkpoint ignores it, like startingVersion. */
  def resolveStarting(options: CaseInsensitiveStringMap,
      conf: org.apache.hadoop.conf.Configuration,
      path: String): Option[Int] = {
    val sv = startingVersion(options)
    val st = Option(options.get("startingTimestamp"))
    require(sv.isEmpty || st.isEmpty,
      "options 'startingVersion' and 'startingTimestamp' are " +
        "mutually exclusive")
    sv.orElse(st.map { s =>
      val ms = java.sql.Timestamp.valueOf(s.replace('T', ' ')).getTime
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf)
      val versions = ManifestSink.listVersions(conf, path)
      versions.find(v => fs.getFileStatus(new Path(dir,
        ManifestSink.versionFile(v))).getModificationTime >= ms)
        .getOrElse(versions.lastOption.getOrElse(0) + 1)
    })
  }

  /** Streaming admission control (see [[VersionAdmission]]). */
  def maxPartsPerTrigger(options: CaseInsensitiveStringMap): Option[Int] = {
    val v = Option(options.get("maxPartsPerTrigger")).map(_.toInt)
    v.foreach(n => require(n >= 1,
      s"option 'maxPartsPerTrigger' must be >= 1, got $n"))
    v
  }
}

/** Change-data-feed plumbing shared by schema inference, the scan and
  * the readers. */
private[sources] object ManifestCdf {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val MetaNames: Set[String] = Set(ChangeTypeCol, CommitVersionCol)
  val MetaFields: Array[StructField] = Array(
    StructField(ChangeTypeCol, StringType, nullable = false),
    StructField(CommitVersionCol, LongType, nullable = false))
}

/** CHANGE DATA FEED over the snapshot log (`option("changeFeed",
  * "true")` on a streaming read) — the `readChangeFeed` analog: each
  * micro-batch emits the row-level deltas BETWEEN consecutive
  * snapshots, tagged `_change_type` ('insert' | 'delete') and
  * `_commit_version`.
  *
  * Granularity is the PART FILE — exactly what the snapshot algebra
  * records: a version's added parts replay as inserts, its removed
  * parts replay as deletes. An append therefore feeds pure inserts
  * (O(new data)); a COW DELETE feeds deletes for every row of each
  * rewritten part plus inserts for its survivors — a part-level
  * restatement, the CDF a format without per-commit CDC files can
  * serve from metadata alone (Delta reads this same shape out of
  * add/remove actions when no _change_data files exist). Downstream
  * keyed consumers reconcile restated rows idempotently — the same
  * contract every upsert sink in this repo already implements.
  *
  * Offsets are snapshot versions (shared with the append-only
  * stream), so checkpointed consumers resume across a COW delete and
  * receive exactly that commit's changes — ManifestStreamSpec pins
  * the resume; the oracle-gated q_stream_cdf pins the feed itself. */
private[sources] class ManifestCdfScan(
    path: String, baseSchema: StructType, required: StructType,
    conf: SerializableConfiguration,
    startingVersion: Option[Int] = None,
    maxPartsPerTrigger: Option[Int] = None,
    ids: Seq[Int] = Seq.empty) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"graft.ManifestCdfScan($path)"
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ManifestChangeFeedStream(path, baseSchema, required, conf,
      startingVersion, maxPartsPerTrigger, ids)
}

/** `maskHex` + `emitOnlyMask` select which line ordinals replay:
  * `emitOnlyMask=false` emits lines NOT in the mask (the part's
  * visible rows under a deletion vector), `=true` emits exactly the
  * lines IN the mask (the newly-deleted ordinals of a vector commit —
  * precise row-level CDC without reading a single surviving row).
  * `eqBlob` carries the part's equality-delete clauses as of the
  * REPLAYED state — matching rows are excluded from any replay (they
  * were already deleted); `emitOnlyEqBlob` inverts it for the eq
  * commit's own diff: emit exactly the rows the NEW clauses remove —
  * row-level CDC for equality deletes, enumerated at read time by
  * evaluating the clause against each line. */
private[sources] case class ManifestCdfPartition(
    path: String, changeType: String, version: Int,
    maskHex: String = "", emitOnlyMask: Boolean = false,
    cols: Seq[Int] = Seq.empty,
    eqBlob: String = "", emitOnlyEqBlob: String = "",
    ncols: Map[Int, Seq[Int]] = Map.empty)
    extends InputPartition

private[sources] class ManifestChangeFeedStream(
    path: String, baseSchema: StructType, required: StructType,
    conf: SerializableConfiguration, startingVersion: Option[Int] = None,
    protected val maxPartsPerTrigger: Option[Int] = None,
    ids: Seq[Int] = Seq.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with VersionAdmission {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class V(v: Int) extends Offset {
    override def json: String = v.toString
  }
  protected def admissionPath: String = path
  protected def admissionConf: SerializableConfiguration = conf
  protected def mkOffset(v: Int): Offset = V(v)
  protected def offsetVersion(o: Offset): Int = o.asInstanceOf[V].v

  /** A fresh consumer replays from `startingVersion` (inclusive) when
    * set — Delta's readChangeFeed startingVersion: nobody wants a new
    * dashboard to re-consume a year of history. Only consulted when
    * no checkpoint exists; resume always wins. */
  override def initialOffset(): Offset =
    V(startingVersion.map(_ - 1).getOrElse(0))
  override def latestOffset(): Offset =
    V(ManifestSink.listVersions(conf.value, path).lastOption.getOrElse(0))
  override def deserializeOffset(json: String): Offset = V(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[V].v
    val e = end.asInstanceOf[V].v
    // one diff per commit in (s, e]: versions must be replayed
    // individually so every change row carries ITS commit's version,
    // even when a trigger spans several commits
    // sidecar vectors resolve here (driver, one part at a time) so the
    // mask a change partition carries is always plain hex; a sidecar
    // is content-immutable once written (each delete publishes a NEW
    // token-named file), so "same (dvHex, dvRef) pair" ⇔ "same vector"
    def vecHex(m: PartMeta): String =
      if (m.dvRef.nonEmpty)
        DeleteVector.toHex(DeleteVector.readRef(conf.value, m.dvRef))
      else m.dvHex
    (s + 1 to e).flatMap { v =>
      val prev: Map[String, PartMeta] =
        if (v == 1) Map.empty
        else ManifestSink.readManifestMeta(conf.value, path, Some(v - 1))
          .map(m => m.path -> m).toMap
      val cur = ManifestSink.readManifestMeta(conf.value, path, Some(v))
      val curPaths = cur.map(_.path).toSet
      // replays always honor the part's EQUALITY-DELETE clauses as of
      // the replayed state (`eqBlob` masks matching rows out), so
      // inserts/deletes never leak rows an earlier eq commit removed
      val inserts = cur.filterNot(m => prev.contains(m.path))
        .map(m => ManifestCdfPartition(m.path, "insert", v, vecHex(m),
          cols = m.cols, eqBlob = EqClause.encode(m.eq),
          ncols = m.ncols))
      val deletes = prev.valuesIterator.filterNot(m => curPaths(m.path))
        .map(m => ManifestCdfPartition(m.path, "delete", v, vecHex(m),
          cols = m.cols, eqBlob = EqClause.encode(m.eq),
          ncols = m.ncols)).toSeq
      // a retained part whose DELETION VECTOR grew: replay exactly
      // the newly-flagged ordinals as deletes — true row-level CDC
      // for merge-on-read deletes, no restatement of survivors.
      // (A RESTORE that rolls a vector BACK emits nothing for the
      // un-deleted rows — restore is a head replacement, not a
      // change event; Delta's CDF has the same blind spot across
      // RESTORE and documents it identically.)
      val dvDeletes = cur.flatMap { m =>
        prev.get(m.path) match {
          case Some(old)
              if m.dvHex != old.dvHex || m.dvRef != old.dvRef =>
            val delta = DeleteVector.minus(
              DeleteVector.fromHex(vecHex(m)),
              DeleteVector.fromHex(vecHex(old)))
            if (DeleteVector.popCount(delta) == 0) None
            else Some(ManifestCdfPartition(m.path, "delete", v,
              DeleteVector.toHex(delta), emitOnlyMask = true,
              cols = m.cols, eqBlob = EqClause.encode(old.eq),
              ncols = m.ncols))
          case _ => None
        }
      }
      // a retained part whose EQUALITY-DELETE clause list grew: the
      // newly-deleted rows ARE enumerable — they are exactly the rows
      // matching the NEW clauses among those visible before (old DV,
      // old clauses) — so the feed emits true row-level deletes for
      // an eq commit by evaluating the clause at read time
      // drop-mask is the NEW vector, not the old: if one commit grows
      // both the DV and the clause list, the DV delta's rows are
      // already emitted by dvDeletes above — masking eqDeletes with
      // the new vector keeps the two partitions disjoint (no row's
      // delete double-emits)
      val eqDeletes = cur.flatMap { m =>
        prev.get(m.path) match {
          case Some(old) if m.eq.size > old.eq.size =>
            Some(ManifestCdfPartition(m.path, "delete", v, vecHex(m),
              cols = m.cols, eqBlob = EqClause.encode(old.eq),
              emitOnlyEqBlob = EqClause.encode(m.eq.drop(old.eq.size)),
              ncols = m.ncols))
          case _ => None
        }
      }
      inserts ++ deletes ++ dvDeletes ++ eqDeletes
    }.toArray
  }

  // pinned once at stream construction, same rationale as
  // ManifestMicroBatchStream: nested ids must describe the stream's
  // fixed schema, not whatever the head evolves to mid-stream
  private val snapCm = ManifestSink.readSchemaAndColMap(conf.value, path)

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestCdfReaderFactory(baseSchema, required, conf, ids,
      ColDefaults.byName(baseSchema, snapCm),
      ManifestSource.nestedIdsFor(snapCm))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Decodes a part's lines through the BASE schema and appends the
  * constant change-metadata columns, honoring column pruning (a
  * pruned-away metadata or data column is never materialized). */
private[sources] class ManifestCdfReaderFactory(
    baseSchema: StructType, required: StructType,
    conf: SerializableConfiguration, ids: Seq[Int] = Seq.empty,
    initDefaults: Map[String, Any] = Map.empty,
    nestedIds: Map[Int, Seq[Int]] = Map.empty)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ManifestCdfPartition]
    // per required field: Right(meta constant) or Left(line slot) —
    // the slot resolves through column mapping exactly like the batch
    // reader (logical field -> stable id -> the part's layout), so a
    // change feed replays correctly across RENAME/DROP commits
    val plan: Array[Either[(Int, DataType), Any]] =
      required.fields.map { f =>
        if (f.name == ManifestCdf.ChangeTypeCol)
          Right(UTF8String.fromString(part.changeType))
        else if (f.name == ManifestCdf.CommitVersionCol)
          Right(part.version.toLong)
        else {
          val li = baseSchema.fieldIndex(f.name)
          val id = if (ids.nonEmpty) ids(li) else li
          val slot =
            if (part.cols.isEmpty) id
            else {
              val s = part.cols.indexOf(id)
              if (s < 0) Int.MaxValue else s
            }
          Left((slot, baseSchema(f.name).dataType))
        }
      }
    // depth-1 struct sub-plans, the batch reader's shared resolution
    // ([[ManifestSource.structPlansFor]]) — a change feed replays
    // structs correctly across nested DDL
    val structPlans: Array[(Array[Int], Array[DataType])] =
      ManifestSource.structPlansFor(required, baseSchema, ids, nestedIds,
        part.ncols,
        Set(ManifestCdf.ChangeTypeCol, ManifestCdf.CommitVersionCol))
    new PartitionReader[InternalRow] {
      private val path = new Path(part.path)
      private val mask = DeleteVector.fromHex(part.maskHex)
      // equality-delete masks (see [[EqMask]]): `dropEq` excludes rows
      // an earlier eq commit already removed from ANY replay;
      // `onlyEq` inverts selection for an eq commit's own delete
      // diff — emit exactly the rows its new clauses match
      private val eqDflts =
        EqMask.defaultToks(baseSchema, ids, initDefaults)
      private val dropEq = EqMask.matchers(part.eqBlob, part.cols, eqDflts)
      private val onlyEq =
        EqMask.matchers(part.emitOnlyEqBlob, part.cols, eqDflts)
      private val in = path.getFileSystem(conf.value).open(path)
      private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      private var current: InternalRow = _
      private var lineNo = -1L

      override def next(): Boolean = {
        var line: String = null
        while (line == null && lines.hasNext) {
          val candidate = lines.next()
          lineNo += 1
          // emitOnlyMask: replay exactly the masked ordinals (a
          // vector commit's newly-deleted rows); otherwise replay the
          // VISIBLE rows (mask = the part's deletion vector)
          val masked = DeleteVector.isDeleted(mask, lineNo)
          if (if (part.emitOnlyMask) masked else !masked) {
            if (dropEq.isEmpty && onlyEq.isEmpty) line = candidate
            else {
              val toks = candidate.split(",", -1)
              if (!EqMask.matches(dropEq, toks) &&
                  (onlyEq.isEmpty || EqMask.matches(onlyEq, toks)))
                line = candidate
            }
          }
        }
        if (line == null) return false
        val cols = line.split(",", -1)
        val vals = new Array[Any](plan.length)
        var j = 0
        while (j < plan.length) {
          vals(j) = plan(j) match {
            case Right(const) => const
            case Left((ord, dt)) =>
              if (ord >= cols.length)
                initDefaults.getOrElse(required.fields(j).name, null)
              else {
                val sp = structPlans(j)
                if (sp == null) ManifestCodec.decode(cols(ord), dt)
                else ManifestCodec.decodeNested(cols(ord), sp._1, sp._2)
              }
          }
          j += 1
        }
        current = new GenericInternalRow(vals)
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

/** OBSERVABILITY (DSv2 custom metrics, surfaced in the SQL UI next
  * to rows/bytes): the pruning a manifest scan performed is exactly
  * what an operator tunes at 100 TB, so the scan reports it —
  * `partsPlanned`/`partsSkipped` from the driver after static +
  * runtime pruning, `dvMaskedRows` summed from the readers (the
  * merge-on-read debt a compaction would settle). */
private[sources] class PartsPlannedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "partsPlanned"
  override def description(): String =
    "data parts planned (after static + runtime pruning)"
}

private[sources] class PartsSkippedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "partsSkipped"
  override def description(): String =
    "data parts skipped by manifest stats/bloom/runtime pruning"
}

private[sources] class DvMaskedRowsMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "dvMaskedRows"
  override def description(): String =
    "rows skipped by deletion vectors (merge-on-read debt)"
}

/** INITIAL column defaults (`EXISTS_DEFAULT`) for the read path: a
  * part written before a defaulted column was added has a shorter
  * line — its missing slot serves the default FROZEN at ADD COLUMN
  * time instead of NULL, making "add a defaulted column to a
  * petabyte" a metadata commit with no backfill. Values are parsed
  * and evaluated ONCE on the driver (literal SQL → internal value,
  * cast to the column type); a non-literal or unparsable default
  * degrades to NULL rather than failing the scan. */
private[sources] object ColDefaults {
  /** field name -> evaluated internal default value, from the
    * snapshot's colmap header. */
  def byName(schema: StructType,
      snapCm: Option[(StructType, ColMap)]): Map[String, Any] =
    snapCm match {
      case Some((snap, cm)) if cm.defaults.nonEmpty =>
        snap.fields.zipWithIndex.flatMap { case (f, i) =>
          val id = cm.ids.lift(i).getOrElse(i)
          cm.defaults.get(id).map(_._2).filter(_.nonEmpty)
            .flatMap(sql => eval(sql, f.dataType))
            .map(v => f.name -> v)
        }.toMap
      case _ => Map.empty
    }

  private def eval(sql: String,
      dt: org.apache.spark.sql.types.DataType): Option[Any] =
    try {
      val e = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sql)
      if (!e.foldable) None
      else Option(org.apache.spark.sql.catalyst.expressions
        .Cast(e, dt, Some("UTC")).eval(null))
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** Shared equality-clause line matching for the batch and CDF
  * readers: clauses compile ONCE per part to (line slot, token set,
  * default-matches) — slot through the part's recorded layout by
  * stable field id, values to the exact line-token form — so the
  * per-row check is a raw-token set probe, zero decode.
  *
  * A clause whose field the part never wrote (slot missing from the
  * layout, or past a short line's width) does NOT simply never-match:
  * the reader serves those rows the column's frozen EXISTS default
  * (see [[ColDefaults]]), so the mask must drop them exactly when
  * that default equals a clause value — otherwise `DELETE WHERE c =
  * v` on a defaulted column silently leaves pre-ADD rows visible,
  * a failed delete in the eq path's own GDPR use case. With no
  * default the missing slot reads NULL, which a non-null clause
  * value never matches — the old never-match behavior. */
private[sources] object EqMask {
  /** fieldId -> RAW default string (pre line-token encoding) for
    * every schema column carrying an evaluated initial default. */
  def defaultToks(schema: StructType, ids: Seq[Int],
      initDefaults: Map[String, Any]): Map[Int, String] =
    if (initDefaults.isEmpty) Map.empty
    else schema.fields.zipWithIndex.flatMap { case (f, i) =>
      val id = if (ids.nonEmpty) ids(i) else i
      initDefaults.get(f.name).filter(_ != null)
        .map(v => id -> v.toString)
    }.toMap

  /** One compiled clause: an IN-set probe (kinds 'l'/'s') or, for
    * kind 'L', a canonical-inclusive numeric range [lo, hi] on a
    * BIGINT column's decimal token (the retention-delete shape —
    * `DELETE WHERE ts < cutoff`). Ranges pay one Long parse per row
    * on clause-bearing parts; set probes stay raw-token. */
  final case class Matcher(slot: Int, vals: Set[String],
      isRange: Boolean, lo: Long, hi: Long, defaultMatches: Boolean)

  /** A long token falls inside the clause range. NULL rows (and any
    * non-numeric token — impossible for a well-formed BIGINT line)
    * never match: `ts < cutoff` is NULL for a NULL ts. */
  def inRange(tok: String, lo: Long, hi: Long): Boolean =
    tok != ManifestCodec.NullToken && {
      try { val v = java.lang.Long.parseLong(tok); v >= lo && v <= hi }
      catch { case _: NumberFormatException => false }
    }

  def matchers(blob: String, partCols: Seq[Int],
      defaults: Map[Int, String] = Map.empty): Array[Matcher] =
    EqClause.decode(blob).map { c =>
      val slot =
        if (partCols.isEmpty) c.fieldId
        else {
          val s = partCols.indexOf(c.fieldId)
          if (s < 0) Int.MaxValue else s
        }
      if (c.kind == 'L') {
        val lo = c.values.head.toLong
        val hi = c.values(1).toLong
        Matcher(slot, Set.empty, isRange = true, lo, hi,
          defaultMatches = defaults.get(c.fieldId)
            .exists(d => inRange(d, lo, hi)))
      } else {
        val vals = c.values.map(v =>
          if (c.kind == 's') ManifestCodec.encodeString(v) else v).toSet
        val dfltTok = defaults.get(c.fieldId).map(v =>
          if (c.kind == 's') ManifestCodec.encodeString(v) else v)
        Matcher(slot, vals, isRange = false, 0L, 0L,
          defaultMatches = dfltTok.exists(vals.contains))
      }
    }.toArray

  def matches(ms: Array[Matcher], toks: Array[String]): Boolean = {
    var i = 0
    while (i < ms.length) {
      val m = ms(i)
      // slot past the line (short pre-ADD line, or missing from the
      // part's layout — Int.MaxValue): the row serves the column's
      // initial default, so it matches iff the default does
      if (m.slot >= toks.length) { if (m.defaultMatches) return true }
      else if (m.isRange) {
        if (inRange(toks(m.slot), m.lo, m.hi)) return true
      }
      else if (m.vals.contains(toks(m.slot))) return true
      i += 1
    }
    false
  }
}

private[sources] class EqMaskedRowsMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "eqMaskedRows"
  override def description(): String =
    "rows skipped by equality-delete clauses (merge-on-read debt)"
}

private[sources] case class LongTaskMetric(metricName: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = v
}

private[sources] class ManifestReaderFactory(
    schema: StructType, required: StructType,
    conf: SerializableConfiguration, rowCap: Long = Long.MaxValue,
    ids: Seq[Int] = Seq.empty,
    initDefaults: Map[String, Any] = Map.empty,
    nestedIds: Map[Int, Seq[Int]] = Map.empty)
    extends PartitionReaderFactory {

  private val fields: Array[String] = required.fieldNames

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ManifestPartition]
    // required-field ordinals into the full written row; the `_part`
    // and `_pos` METADATA columns are served from the partition
    // itself (path constant / line ordinal), never decoded from the
    // line (sentinels -1 / -2). With COLUMN MAPPING the resolution is
    // per part: logical field -> stable field id (`ids`, identity
    // when absent) -> the part's recorded line slot (`part.cols`;
    // absent = the legacy identity layout, slot = id). A field the
    // part never wrote (added later, or its slot was dropped before
    // the part was written) resolves past the line's width and reads
    // NULL — same rule additive evolution always used.
    val ordinals = fields.map {
      case PartMetaColumn.Name => -1
      case PosMetaColumn.Name  => -2
      case f =>
        val li = schema.fieldIndex(f)
        val id = if (ids.nonEmpty) ids(li) else li
        if (part.cols.isEmpty) id
        else {
          val slot = part.cols.indexOf(id)
          if (slot < 0) Int.MaxValue else slot
        }
    }
    val types = fields.map(f =>
      if (f == PartMetaColumn.Name || f == PosMetaColumn.Name)
        org.apache.spark.sql.types.StringType
      else schema(f).dataType)
    // DEPTH-1 STRUCT decode plans (shared resolution — see
    // [[ManifestSource.structPlansFor]])
    val structPlans: Array[(Array[Int], Array[DataType])] =
      ManifestSource.structPlansFor(required, schema, ids, nestedIds,
        part.ncols, Set(PartMetaColumn.Name, PosMetaColumn.Name))
    // INITIAL DEFAULTS: the fallback a missing line slot serves —
    // NULL for ordinary additive evolution, the frozen EXISTS default
    // for columns added with one (see [[ColDefaults]])
    val dflts: Array[Any] = fields.map(f => initDefaults.getOrElse(f, null))
    new PartitionReader[InternalRow] {
      private val path = new Path(part.path)
      private val partConst = UTF8String.fromString(part.path)
      // merge-on-read: the part's deletion vector masks flagged line
      // ordinals — data files are never rewritten by a MOR delete.
      // Sidecar vectors are read ON THE EXECUTOR (one small file next
      // to the part), inline hex decodes from the partition itself.
      private val dv =
        if (part.dvRef.nonEmpty) DeleteVector.readRef(conf.value, part.dvRef)
        else DeleteVector.fromHex(part.dvHex)
      // EQUALITY-DELETE masking (see [[EqMask]]): rename/drop-proof
      // by stable field id, zero per-row decode; default-aware so a
      // clause on a defaulted later-added column still drops the
      // pre-ADD rows that serve the frozen default
      private val eqMatchers = EqMask.matchers(part.eqBlob, part.cols,
        EqMask.defaultToks(schema, ids, initDefaults))
      private def eqDeleted(cols: Array[String]): Boolean =
        EqMask.matches(eqMatchers, cols)
      private val in = path.getFileSystem(conf.value).open(path)
      private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      private var current: InternalRow = _
      private var emitted = 0L
      private var lineNo = -1L
      private var masked = 0L
      private var eqMasked = 0L

      override def currentMetricsValues()
          : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(LongTaskMetric("dvMaskedRows", masked),
          LongTaskMetric("eqMaskedRows", eqMasked))

      override def next(): Boolean = {
        // a pushed limit caps every partition: one partition can
        // satisfy at most the whole limit, so stop reading past it
        if (emitted >= rowCap) return false
        var line: String = null
        while (line == null && lines.hasNext) {
          val candidate = lines.next()
          lineNo += 1
          if (!DeleteVector.isDeleted(dv, lineNo)) {
            if (eqMatchers.isEmpty) line = candidate
            else if (!eqDeleted(candidate.split(",", -1))) line = candidate
            else eqMasked += 1
          } else masked += 1
        }
        if (line == null) return false
        emitted += 1
        val cols = line.split(",", -1)
        val vals = new Array[Any](ordinals.length)
        var j = 0
        while (j < ordinals.length) {
          // additive schema evolution: a part committed before a
          // column was added has a shorter line — the missing
          // trailing columns read as NULL, no data rewrite
          vals(j) = ordinals(j) match {
            case -1 => partConst
            case -2 => lineNo
            case o if o >= cols.length => dflts(j)
            case o =>
              val sp = structPlans(j)
              if (sp == null) ManifestCodec.decode(cols(o), types(j))
              else ManifestCodec.decodeNested(cols(o), sp._1, sp._2)
          }
          j += 1
        }
        current = new GenericInternalRow(vals)
        true
      }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

/** Line codec shared by [[ManifestSink]]'s writer and
  * [[ManifestSource]]'s reader. Atomic types only (the repo-wide
  * scalar-output convention). Strings are URL-encoded so the comma
  * separator, newlines, and arbitrary unicode round-trip; NULL is the
  * `\N` sentinel (which an encoded string can never produce — the
  * encoder escapes backslash), so NULL and empty string stay
  * distinct. */
private[sources] object ManifestCodec {
  private[sources] val NullToken = "\\N"

  /** URL-safe chars that URLEncoder passes through UNCHANGED — a
    * string of only these needs no encoding (and, containing neither
    * '%' nor '+', no decoding either), so the overwhelmingly common
    * identifier-ish values ('click', 'URGENT', part keys) skip the
    * URLEncoder allocation + charset machinery on BOTH sides of every
    * row. The fast path is exact: it reproduces URLEncoder's output
    * byte-for-byte on exactly this alphabet, so fast-written lines
    * decode on any reader and vice versa. */
  private def urlSafe(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '-' || c == '_' || c == '*'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** The exact line-token form of a string value — shared by the row
    * writer and by equality-delete readers canonicalizing clause
    * values, so token comparison needs zero per-row decode. */
  def encodeString(s: String): String =
    if (urlSafe(s)) s else java.net.URLEncoder.encode(s, "UTF-8")

  def encode(row: InternalRow, schema: StructType): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < schema.fields.length) {
      if (i > 0) sb.append(',')
      if (row.isNullAt(i)) sb.append(NullToken)
      else schema.fields(i).dataType match {
        case StringType =>
          sb.append(encodeString(row.getUTF8String(i).toString))
        case BinaryType =>
          // Base64 (comma-free alphabet, so the line split is safe);
          // decode below is type-directed, so '+'/'=' never collide
          // with the string fast-path check
          sb.append(java.util.Base64.getEncoder.encodeToString(
            row.getBinary(i)))
        // DEPTH-1 STRUCT column (the reference's progressively
        // enriched prediction record, estimate_queue.py:80-88): one
        // line token = '!' + sub-tokens joined by ';'. Both chars are
        // produced by NO atomic encoding (URLEncoder escapes them,
        // Base64's alphabet lacks them, numbers can't contain them),
        // so the split is safe and the '!' prefix keeps a non-null
        // single-field struct of a NULL value distinct from a NULL
        // struct. Sub-fields must be atomic (enforced at CREATE/DDL).
        case st: StructType =>
          val sub = row.getStruct(i, st.fields.length)
          sb.append('!')
          var k = 0
          while (k < st.fields.length) {
            if (k > 0) sb.append(';')
            if (sub.isNullAt(k)) sb.append(NullToken)
            else st.fields(k).dataType match {
              case StringType =>
                sb.append(encodeString(sub.getUTF8String(k).toString))
              case BinaryType =>
                sb.append(java.util.Base64.getEncoder.encodeToString(
                  sub.getBinary(k)))
              case dt => sb.append(sub.get(k, dt).toString)
            }
            k += 1
          }
        case dt => sb.append(row.get(i, dt).toString)
      }
      i += 1
    }
    sb.toString
  }

  /** Decode a depth-1 struct token through its NESTED column mapping:
    * `slots(k)` is the sub-token index serving required sub-field k
    * (resolved logical path -> stable nested field id -> the part's
    * recorded sub-layout, exactly the top-level rule one level down).
    * A slot past the token's width — a sub-field added after the part
    * was written, or whose slot was dropped before — reads NULL. */
  def decodeNested(token: String, slots: Array[Int],
      types: Array[DataType]): Any =
    if (token == NullToken || token.isEmpty) null
    else {
      val toks = token.substring(1).split(";", -1)
      val vals = new Array[Any](slots.length)
      var k = 0
      while (k < slots.length) {
        val s = slots(k)
        vals(k) =
          if (s < 0 || s >= toks.length) null
          else decode(toks(s), types(k))
        k += 1
      }
      new GenericInternalRow(vals)
    }

  def decode(s: String, dt: DataType): Any =
    if (s == NullToken) null
    else dt match {
      case LongType      => s.toLong
      case IntegerType   => s.toInt
      case ShortType     => s.toShort
      case ByteType      => s.toByte
      case DoubleType    => s.toDouble
      case FloatType     => s.toFloat
      case BooleanType   => s.toBoolean
      case TimestampType => s.toLong // micros, as the writer printed it
      case DateType      => s.toInt  // days
      case StringType    =>
        // no escape bytes ⇒ the encoded form IS the value
        if (s.indexOf('%') < 0 && s.indexOf('+') < 0) UTF8String.fromString(s)
        else UTF8String.fromString(java.net.URLDecoder.decode(s, "UTF-8"))
      case d: DecimalType =>
        Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
      case BinaryType    => java.util.Base64.getDecoder.decode(s)
      case other =>
        throw new UnsupportedOperationException(
          s"manifest codec supports atomic types only, got $other")
    }
}
