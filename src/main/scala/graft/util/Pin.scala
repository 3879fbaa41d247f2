package graft.util

import org.apache.spark.sql.DataFrame

/** Materialization strategy for iterative-loop DataFrames (graph
  * fixed-points, pointer-jumping, shared self-join inputs): every
  * round re-scans the pinned result, so its lineage must be CUT, not
  * cached — a plain cache still re-derives the full DAG on executor
  * loss, and after K rounds that DAG is K joins deep.
  *
  * Two modes, chosen by config:
  *
  *  - default: `localCheckpoint()` — blocks live in executor storage.
  *    Right for local mode and fastest on a healthy cluster, but an
  *    executor loss discards its blocks and Spark CANNOT recompute
  *    them (the lineage was truncated) — the job dies.
  *  - `graft.checkpoint.dir` set: RELIABLE `checkpoint()` into that
  *    directory (HDFS/object store on a cluster). Blocks survive any
  *    executor loss; a 1000-executor run that sheds nodes hourly
  *    recovers mid-iteration instead of restarting the whole loop.
  *    Costs one write+read of the pinned data per pin — the standard
  *    fault-tolerance premium for long iterative jobs (GraphX and
  *    MLlib expose the same dial as their checkpoint interval).
  *
  * GraphOpsSpec pins that both modes produce identical results on
  * the graph fixed-points.
  */
object Pin {
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("graft.checkpoint.dir") match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    /** `df.pinned()` — localCheckpoint, or reliable checkpoint when
      * `graft.checkpoint.dir` is configured. */
    def pinned(): DataFrame = Pin.pin(df)
  }
}
