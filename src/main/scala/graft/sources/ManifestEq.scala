package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.{And => FAnd, EqualTo => FEq, Filter => V1Filter, GreaterThan => FGt, GreaterThanOrEqual => FGe, In => FIn, LessThan => FLt, LessThanOrEqual => FLe}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** EQUALITY DELETES (`graft.delete.mode=eq` — the Iceberg v2
  * equality-delete file shape, inlined on the manifest): `DELETE
  * WHERE col = v` / `col IN (...)` / a BIGINT range (`ts < cutoff`,
  * BETWEEN — the retention shape) commits as PURE METADATA — each
  * part that MAY contain a match (range/bloom/null stats cannot rule
  * it out) gets an [[EqClause]] appended to its line; provably-clean
  * parts are carried untouched; for RANGE deletes, parts provably
  * inside the interval additionally DROP from the part list
  * entirely (see [[rangeDisposition]]); NO data file is read or
  * written.
  *
  * This is the opposite cost trade from every other delete path:
  *  - COW rewrites matching parts (write cost O(matched parts)),
  *  - MOR DVs scan to find ordinals (read cost O(candidate parts)),
  *  - a metadata delete drops whole parts (free, but only when parts
  *    are entirely covered),
  *  - an EQ delete is O(parts) DRIVER METADATA regardless of table
  *    size — the GDPR/right-to-be-forgotten shape at 100 TB: deleting
  *    one user from a petabyte costs one manifest commit; READERS pay
  *    (a per-row token probe on clause-bearing parts) until
  *    compaction materializes the clauses away.
  *
  * Honesty ledger (what pending clauses DEMOTE, all spec-pinned):
  * exact metadata answers (COUNT/SUM/MIN/MAX pushdown) decline;
  * `.files`/`.partitions` report visible_rows as NULL on pending
  * parts; the change feed crosses an eq commit by EVALUATING the new
  * clauses at read time against the previously-visible rows — true
  * row-level deletes, no pre-compaction refusal (`q_stream_cdf_eq`
  * depends on this); stats stay safe OVER-approximations for
  * pruning, budgets and limits.
  * Snapshot algebra stays intact: the clause change IS a part-line
  * restatement, so MV refresh restates affected parts by reference
  * (minus the old line, plus the masked new one) like any DV commit.
  *
  * Time travel is unaffected (pre-delete snapshots list clause-free
  * lines); conflict detection composes through [[ManifestSink
  * .publishRebase]] — the clause re-marks against the freshly-read
  * head on claim retry, so a racing append's new parts are marked or
  * skipped by THEIR stats, never lost.
  */
private[sources] object ManifestEq {

  def eqEnabled(spark: SparkSession): Boolean =
    try spark.conf.get(ManifestMor.ModeConf, "") == "eq"
    catch { case scala.util.control.NonFatal(_) => false }

  /** The single-column equality clause these deletes accept: exactly
    * one `=` or `IN` filter on a BIGINT/STRING column. Values are
    * canonicalized to raw form ('l' = decimal string); NULLs in an
    * IN-list drop (`col = NULL` never matches a row). Range deletes
    * take [[translateRange]] instead; anything else returns None and
    * the session falls back to COW/MOR. */
  def translate(schema: StructType,
      filters: Array[V1Filter]): Option[(String, Seq[Any])] =
    filters match {
      case Array(FEq(c, v)) if v != null => Some((c, Seq(v)))
      case Array(FIn(c, vs)) if vs.nonEmpty =>
        Some((c, vs.toSeq.filter(_ != null)))
      case _ => None
    }

  /** The RANGE clause shape (kind 'L'): a conjunction of `<`/`<=`/
    * `>`/`>=` (BETWEEN arrives as the GE+LE pair) on ONE BIGINT
    * column, canonicalized to the inclusive interval [lo, hi] —
    * `DELETE WHERE ts < cutoff`, the GDPR/TTL retention shape. Under
    * eq mode this commits as pure metadata with THREE part classes:
    * parts provably inside the range DROP from the part list
    * (min/max ⊆ range and zero nulls — the metadata-delete answer),
    * provably-outside parts carry forward untouched, and straddlers
    * gain the range clause (read-side per-row interval probe, one
    * Long parse per row, until compaction materializes it). At
    * 100 TB a retention delete is then one manifest commit whose
    * read-side debt is confined to the O(1) boundary parts —
    * time-ordered ingest makes almost every part provably-inside or
    * provably-outside. An empty canonical interval (lo > hi) means
    * the predicate matches nothing: the delete is a no-op. */
  def translateRange(schema: StructType,
      filters: Array[V1Filter]): Option[(String, Long, Long)] = {
    def one(f: V1Filter): Option[(String, Long, Long)] = f match {
      case FLt(c, v: Number) =>
        val b = v.longValue
        // x < MinValue matches nothing — emit the empty canonical
        // interval (lo > hi), NOT the one-point [MinValue, MinValue]
        // which would wrongly delete rows AT the extreme
        if (b == Long.MinValue) Some((c, 1L, 0L))
        else Some((c, Long.MinValue, b - 1))
      case FLe(c, v: Number) => Some((c, Long.MinValue, v.longValue))
      case FGt(c, v: Number) =>
        val b = v.longValue
        // x > MaxValue matches nothing — same empty-interval rule
        if (b == Long.MaxValue) Some((c, 1L, 0L))
        else Some((c, b + 1, Long.MaxValue))
      case FGe(c, v: Number) => Some((c, v.longValue, Long.MaxValue))
      case FAnd(a, b) => for {
        x <- one(a); y <- one(b); if x._1 == y._1
      } yield (x._1, math.max(x._2, y._2), math.min(x._3, y._3))
      case _ => None
    }
    if (filters.isEmpty) return None
    val legs = filters.toSeq.map(one)
    if (legs.exists(_.isEmpty)) return None
    val ls = legs.flatten
    val col = ls.head._1
    if (!ls.forall(_._1 == col)) None
    else if (legs.size == 1 && ls.head._2 == Long.MinValue &&
        ls.head._3 == Long.MaxValue) None // vacuous, let other paths own it
    else Some((col, ls.map(_._2).max, ls.map(_._3).min))
  }

  /** Kind-'L' clause for the canonical inclusive range — BIGINT
    * columns only. Strings are excluded deliberately: range masking
    * compares the LINE TOKEN, and string tokens are URL-encoded, so
    * token order ≠ value order ('a%2Fb' vs 'ab'); a wrong mask is a
    * silent wrong answer, and string-range retention deletes are not
    * a shape anyone ships. */
  private def rangeClauseOf(schema: StructType, cm: ColMap, col: String,
      lo: Long, hi: Long): Option[EqClause] = {
    val idx = schema.fields.indexWhere(_.name == col)
    if (idx < 0) return None
    val id = if (cm.ids.nonEmpty) cm.ids(idx) else idx
    schema.fields(idx).dataType match {
      case LongType =>
        Some(EqClause(col, id, 'L', Seq(lo.toString, hi.toString)))
      case _ => None
    }
  }

  private def clauseOf(schema: StructType, cm: ColMap, col: String,
      values: Seq[Any]): Option[EqClause] = {
    val idx = schema.fields.indexWhere(_.name == col)
    if (idx < 0) return None
    val id = if (cm.ids.nonEmpty) cm.ids(idx) else idx
    schema.fields(idx).dataType match {
      case LongType =>
        Some(EqClause(col, id, 'l',
          values.map(v => v.asInstanceOf[Number].longValue.toString)))
      case StringType =>
        Some(EqClause(col, id, 's', values.map(_.toString)))
      case _ => None
    }
  }

  /** Could this part hold a row matching the clause? Range, bloom and
    * null-count stats each get a veto; no stats = must mark (marking
    * a clean part is only a read-side cost, never a wrong answer).
    *
    * `defaultTok` is the clause column's evaluated initial default in
    * raw clause-value form, when one exists: a part whose recorded
    * layout never wrote the column serves EVERY row that frozen
    * default (see [[ColDefaults]]), so it must be marked exactly when
    * the default is a clause value — the stats branches below would
    * otherwise never-match it and the delete would silently skip its
    * rows. Without a default those rows read NULL, which a non-null
    * clause value never matches: exonerated. */
  private[sources] def mayMatch(p: PartMeta, c: EqClause,
      keyCol: Option[String], strCol: Option[String],
      defaultTok: Option[String] = None): Boolean =
    if (p.rows == 0L) false
    else if (p.cols.nonEmpty && !p.cols.contains(c.fieldId))
      defaultTok.exists(c.values.contains)
    else if (keyCol.contains(c.col))
      c.values.exists(v => p.mayContain(v.toLong))
    else if (strCol.contains(c.col))
      // all-null string part cannot match a (non-null) clause value
      !(p.sNulls >= 0 && p.sNulls == p.rows) &&
        c.values.exists(v => p.strOverlaps(Some(v), Some(v)))
    else p.cstats.get(c.col) match {
      case Some(st) if st.kind == 'l' =>
        st.nulls != p.rows &&
          c.values.exists(v => v.toLong >= st.lMin && v.toLong <= st.lMax)
      case Some(st) =>
        st.nulls != p.rows && c.values.exists(v =>
          StrBin.cmp(v, st.min) >= 0 && StrBin.cmp(v, st.max) <= 0)
      case None => true // untracked column: cannot exonerate
    }

  /** Part disposition under a range delete: 'd' = every visible row
    * provably matches (drop the line — the metadata-delete answer),
    * 'u' = no row can match (carried untouched), 'm' = straddler or
    * undecidable (mark with the clause — read-side cost only, never
    * a wrong answer). NULL rows never match a range, so a drop
    * additionally requires a PROVEN zero null count. */
  private[sources] def rangeDisposition(p: PartMeta, c: EqClause,
      lo: Long, hi: Long, keyCol: Option[String],
      defaultTok: Option[String] = None): Char = {
    if (p.rows == 0L) return 'u'
    if (p.cols.nonEmpty && !p.cols.contains(c.fieldId))
      // layout never wrote the column: every row serves the frozen
      // initial default — all match when it lands inside the range,
      // none otherwise (no default = NULL = never matches)
      return if (defaultTok.exists(d => EqMask.inRange(d, lo, hi))) 'd'
             else 'u'
    def decide(vMin: Long, vMax: Long, nulls: Long): Char =
      if (nulls >= 0 && nulls == p.rows) 'u'
      else if (vMin > vMax) 'm'
      else if (vMax < lo || vMin > hi) 'u'
      else if (vMin >= lo && vMax <= hi && nulls == 0L) 'd'
      else 'm'
    if (keyCol.contains(c.col)) decide(p.kMin, p.kMax, p.kNulls)
    else p.cstats.get(c.col) match {
      case Some(st) if st.kind == 'l' => decide(st.lMin, st.lMax, st.nulls)
      case _ => 'm'
    }
  }

  /** True when the session should take — and the predicate can take —
    * the equality-delete path (`=`/IN clause, or a BIGINT range). */
  def canDelete(spark: SparkSession, path: String, schema: StructType,
      filters: Array[V1Filter]): Boolean =
    eqEnabled(spark) && {
      lazy val cm = ManifestSink.readSchemaAndColMap(
        ManifestSink.driverConf(), path)
        .map(_._2).getOrElse(ColMap.identity(schema.fields.length))
      translate(schema, filters).exists { case (col, vs) =>
        clauseOf(schema, cm, col, vs).isDefined
      } || translateRange(schema, filters).exists { case (col, lo, hi) =>
        rangeClauseOf(schema, cm, col, lo, hi).isDefined
      }
    }

  /** Commit the clause: one metadata snapshot, no data I/O. With a
    * session branch the clause commits to the BRANCH line (the parts
    * marked are the branch head's; main stays untouched until
    * fast_forward) — the eq path joins COW/MOR/vector DML in the
    * write-audit-publish story. */
  def deleteWhere(path: String, schema: StructType,
      filters: Array[V1Filter],
      branch: Option[String] = None): Unit = {
    val conf = ManifestSink.driverConf()
    val cm = ManifestSink.readSchemaAndColMap(conf, path).map(_._2)
      .getOrElse(ColMap.identity(schema.fields.length))
    val keyCol = schema.fields.find(_.dataType == LongType).map(_.name)
    // the clause column's frozen initial default, raw form — parts
    // whose layout predates the column serve it for every row
    def dfltTok(col: String): Option[String] =
      ColDefaults.byName(schema, ManifestSink.readSchemaAndColMap(conf, path))
        .get(col).map(_.toString)
    translate(schema, filters) match {
      case Some((col, vs)) =>
        val clause = clauseOf(schema, cm, col, vs).getOrElse(
          throw new IllegalArgumentException(
            s"equality delete: unsupported column '$col'"))
        val strCol = schema.fields.find(_.dataType == StringType).map(_.name)
        val dflt = dfltTok(col)
        // an IN-list of only NULLs matches nothing: commit nothing
        if (clause.values.isEmpty) return
        ManifestSink.publishRebase(conf, path, schema, history = true,
          rebase = head => head.map { p =>
            if (mayMatch(p, clause, keyCol, strCol, dflt))
              p.copy(eq = p.eq :+ clause)
            else p
          },
          strictBase = None, branch = branch, op = "delete")
      case None =>
        // RANGE delete (`ts < cutoff`, BETWEEN): one metadata commit —
        // provably-inside parts DROP, straddlers gain the 'L' clause,
        // provably-outside parts carry forward untouched
        val (col, lo, hi) = translateRange(schema, filters).getOrElse(
          throw new IllegalArgumentException(
            "equality delete requires one '='/IN predicate on a " +
              "BIGINT/STRING column, or a range conjunction on one " +
              "BIGINT column"))
        if (lo > hi) return // empty interval: matches nothing
        val clause = rangeClauseOf(schema, cm, col, lo, hi).getOrElse(
          throw new IllegalArgumentException(
            s"range delete: unsupported column '$col' (BIGINT only)"))
        val dflt = dfltTok(col)
        ManifestSink.publishRebase(conf, path, schema, history = true,
          rebase = head => head.flatMap { p =>
            rangeDisposition(p, clause, lo, hi, keyCol, dflt) match {
              case 'd' => None
              case 'm' => Some(p.copy(eq = p.eq :+ clause))
              case _   => Some(p)
            }
          },
          strictBase = None, branch = branch, op = "delete")
    }
  }
}
