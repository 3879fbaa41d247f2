package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.{EqualTo => FEq, Filter => V1Filter, In => FIn}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** EQUALITY DELETES (`graft.delete.mode=eq` — the Iceberg v2
  * equality-delete file shape, inlined on the manifest): `DELETE
  * WHERE col = v` / `col IN (...)` commits as PURE METADATA — each
  * part that MAY contain a match (range/bloom/null stats cannot rule
  * it out) gets an [[EqClause]] appended to its line; provably-clean
  * parts are carried untouched; NO data file is read or written.
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
    * IN-list drop (`col = NULL` never matches a row). Anything else
    * returns None and the session falls back to COW/MOR — the
    * EXPLICIT ROUTING CONTRACT for the other common retention shape:
    * a RANGE delete (`ts < cutoff`, BETWEEN) under eq mode takes the
    * metadata/COW/MOR row-level paths, never a clause (EqSpec pins
    * it). Ranges mask whole swaths of every part — the per-row token
    * probe that makes `=`/IN clauses cheap to serve would become the
    * dominant read cost, while range deletes are exactly what part
    * min/max stats already decide well. */
  def translate(schema: StructType,
      filters: Array[V1Filter]): Option[(String, Seq[Any])] =
    filters match {
      case Array(FEq(c, v)) if v != null => Some((c, Seq(v)))
      case Array(FIn(c, vs)) if vs.nonEmpty =>
        Some((c, vs.toSeq.filter(_ != null)))
      case _ => None
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

  /** True when the session should take — and the predicate can take —
    * the equality-delete path. */
  def canDelete(spark: SparkSession, path: String, schema: StructType,
      filters: Array[V1Filter]): Boolean =
    eqEnabled(spark) && translate(schema, filters).exists {
      case (col, vs) =>
        val cm = ManifestSink.readSchemaAndColMap(
          ManifestSink.driverConf(), path)
          .map(_._2).getOrElse(ColMap.identity(schema.fields.length))
        clauseOf(schema, cm, col, vs).isDefined
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
    val (col, vs) = translate(schema, filters).getOrElse(
      throw new IllegalArgumentException(
        "equality delete requires one '=' or IN predicate on a " +
          "BIGINT/STRING column"))
    val cm = ManifestSink.readSchemaAndColMap(conf, path).map(_._2)
      .getOrElse(ColMap.identity(schema.fields.length))
    val clause = clauseOf(schema, cm, col, vs).getOrElse(
      throw new IllegalArgumentException(
        s"equality delete: unsupported column '$col'"))
    val keyCol = schema.fields.find(_.dataType == LongType).map(_.name)
    val strCol = schema.fields.find(_.dataType == StringType).map(_.name)
    // the clause column's frozen initial default, raw form — parts
    // whose layout predates the column serve it for every row
    val dfltTok: Option[String] =
      ColDefaults.byName(schema, ManifestSink.readSchemaAndColMap(conf, path))
        .get(col).map(_.toString)
    // an IN-list of only NULLs matches nothing: commit nothing
    if (clause.values.isEmpty) return
    ManifestSink.publishRebase(conf, path, schema, history = true,
      rebase = head => head.map { p =>
        if (mayMatch(p, clause, keyCol, strCol, dfltTok))
          p.copy(eq = p.eq :+ clause)
        else p
      },
      strictBase = None, branch = branch, op = "delete")
  }
}
