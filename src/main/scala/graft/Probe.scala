package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement helper (guide §1): run named queries
  * once under a Bench-identical session and print, per completed stage,
  * its task count and wall time, plus per-micro-batch durationMs for
  * every streaming query. Diagnostic only — never part of the bench
  * or verify paths.
  *
  * Usage: runMain graft.Probe <q1,q2,...>
  */
object Probe {

  /** Registered via StaticSQLConf streamingQueryListeners so child
    * sessions (the streaming surface runs in one) inherit it. */
  class ProgressListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      println(f"[probe] stream started ${e.name} t=${System.nanoTime() / 1e9}%.3f")
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs}")
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      println(f"[probe] stream terminated t=${System.nanoTime() / 1e9}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("").split(",").map(_.trim)
      .filter(_.nonEmpty)
    val sfDir = graft.util.Env.orElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.util.Env.orElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.Probe$ProgressListener")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b
        println(s"[probe] stage=${i.stageId} tasks=${i.numTasks} " +
          s"ms=${ms.getOrElse(-1L)} name=${i.name.take(80)}")
      }
    })
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    exec(spark.read.parquet(s"$sfDir/lineitem.parquet"))
    exec(spark.read.parquet(s"$sfDir/events.parquet"))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          println(s"[probe] ===== $name =====")
          val t0 = System.nanoTime()
          exec(fn(spark, sfDir))
          println(f"[probe] $name total=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
