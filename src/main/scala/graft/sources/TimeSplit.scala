package graft.sources

/** HIDDEN TIME-TRANSFORM partitioning (`PARTITIONED BY (days(ts))` /
  * `(hours(ts))` — the Iceberg hidden-partitioning shape): rows route
  * by the DERIVED day/hour ordinal of a TIMESTAMP column, never by a
  * user-maintained date string column. One ordinal = one single-valued
  * part per write (in the derived domain), so
  *
  *  - timestamp RANGE predicates prune to exactly the covered
  *    ordinals' parts off the per-part micros stats (the 'l' ColStat
  *    leg the writer records for TIMESTAMP columns),
  *  - SHOW PARTITIONS / ALTER TABLE DROP PARTITION speak day (DATE) /
  *    hour values straight off the manifest, and
  *  - layout evolution follows the identity-split rules (mixed
  *    generations stay correct, compaction migrates).
  *
  * Ordinals are UTC epoch-based: `floorDiv(micros, unit)` — the same
  * arithmetic on writer, scan, and DDL sides, so the three can never
  * disagree about a row's partition. Generalizes the reference's
  * timestamp-keyed records (estimate_queue.py:49-51: every record is
  * keyed by a parsed capture timestamp) to a declared table layout. */
private[sources] object TimeSplit {
  val DayMicros: Long = 86400000000L
  val HourMicros: Long = 3600000000L

  val Days = "days"
  val Hours = "hours"

  def valid(t: String): Boolean = t == Days || t == Hours

  def unit(t: String): Long = t match {
    case Days => DayMicros
    case Hours => HourMicros
    case other => throw new IllegalArgumentException(
      s"unknown time transform '$other' (days | hours)")
  }

  /** The partition ordinal a timestamp belongs to (UTC epoch day or
    * hour; floorDiv keeps pre-1970 instants in their own, correct
    * ordinal instead of sharing ordinal 0 with post-1970 ones). */
  def ordinal(micros: Long, t: String): Long =
    Math.floorDiv(micros, unit(t))

  /** The part's provable single partition ordinal, from its recorded
    * micros stats: defined iff the part has zero nulls on the column
    * and its min/max fall in the SAME ordinal. A pre-layout part
    * (straddling or stat-less) yields None — "cannot prove", which
    * every consumer must treat as "may hold anything". */
  def partOrdinal(st: Option[ColStat], rows: Long,
      t: String): Option[Long] = st match {
    case Some(c) if c.kind == 'l' && c.nulls == 0 =>
      val lo = ordinal(c.lMin, t)
      if (lo == ordinal(c.lMax, t)) Some(lo) else None
    case _ => None
  }

  /** Could the part hold ANY row of the ordinal? (stats get a veto;
    * absent stats cannot exonerate) */
  def mayHoldOrdinal(st: Option[ColStat], rows: Long, want: Long,
      t: String): Boolean = st match {
    case Some(c) if c.kind == 'l' =>
      c.nulls != rows &&
        ordinal(c.lMax, t) >= want && ordinal(c.lMin, t) <= want
    case _ => true
  }
}
