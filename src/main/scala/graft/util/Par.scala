package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism repair for CPU-heavy stages above LOW-PARALLELISM scans
  * (optimization guide §2.5 "input skew": one huge unsplittable file).
  * The bench tables are single-file, single-row-group parquet, so a
  * scan stage plans exactly ONE task and per-row-expensive expressions
  * (XML/JSON parse, PNG decode, decimal folds, explode fan-outs) run
  * on one core while the rest of the machine idles — the classic
  * "stage sits at 1 running task" straggler shape.
  *
  * Both helpers pin an EXPLICIT partition count (a user-specified
  * repartition is never AQE-coalesced; byte-based coalescing is blind
  * to per-row CPU cost and would fold these tiny-byte/heavy-CPU
  * partitions straight back to one), derived from the cluster's
  * default parallelism — never a constant tuned for one machine.
  *
  * Scale safety: [[fanOut]] NO-OPS whenever the input already plans at
  * least that many partitions — at 100 TB a table carries file/
  * row-group parallelism ≫ cores, so no exchange is added where the
  * scan is already wide (guide §2.4: don't add exchanges). Call it on
  * a SCAN-STAGE dataframe only (plain table read + narrow projection,
  * no exchanges or subqueries underneath): for such plans `df.rdd`
  * builds the file-scan RDD without triggering any job, so the
  * partition probe is free.
  */
object Par {

  private def parallelismOf(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Round-robin fan-out ahead of a CPU-bound stage (typically a heavy
    * projection or the partial side of an aggregation). No-op when the
    * scan is already at least default-parallelism wide. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = parallelismOf(df)
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Keyed fan-out for window/aggregate operators over MODEST-
    * cardinality keys: the SAME hash exchange the operator requires
    * (clustering on `keys` — no extra shuffle in the plan), but
    * pinned with an explicit count (REPARTITION_BY_NUM) so AQE's
    * byte-based coalescing cannot fold the small-but-CPU-heavy
    * exchange back to one task and serialize every per-group sort
    * (r21 measured exactly that: q_mode_median's 100k-row median
    * window ran as two 1-task stages under ENSURE_REQUIREMENTS).
    * The count follows spark.sql.shuffle.partitions — the
    * scale-parameterized dial, identical to what the operator's own
    * exchange would have used. */
  def keyedFanOut(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)

  /** Total-order fan-out: range-partition by `keys` + in-partition
    * sort — globally ordered exactly like `orderBy(keys)` (keys must
    * be a total order, as every hash-gated query's sort already is),
    * but placed BELOW a heavy projection it distributes the per-row
    * work across the range partitions while keeping the plan at ONE
    * exchange (the sort's own, which the query paid anyway). Use when
    * the final operator is a total sort over scan-available keys and
    * the expensive expressions can be evaluated after it. */
  def sortedFanOut(df: DataFrame, keys: Column*): DataFrame = {
    val parts = math.max(parallelismOf(df), df.rdd.getNumPartitions)
    df.repartitionByRange(parts, keys: _*).sortWithinPartitions(keys: _*)
  }
}
