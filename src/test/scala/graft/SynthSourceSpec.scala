package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.SynthSource

/** DSv2 source-extension guarantees: partition pruning from pushed id
  * bounds, column pruning into the reader, correctness of the pruned
  * scan vs an unpruned reference, and generator determinism. */
class SynthSourceSpec extends SparkSpec {

  private def synth(rows: Long, parts: Int = 32) =
    spark.read.format("graft.sources.SynthSource")
      .option("rows", rows.toString)
      .option("partitions", parts.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("id range predicate prunes input partitions at planning time") {
    val pruned = synth(320000, 32).filter(col("id") < 50000L)
    // 32 partitions of 10k rows; id < 50000 overlaps exactly 5
    assert(scanOf(pruned).inputPartitions.length === 5)
    // and the unfiltered scan keeps all 32
    assert(scanOf(synth(320000, 32)).inputPartitions.length === 32)
  }

  test("projection prunes unused columns out of the reader") {
    val df = synth(1000).select(col("station_id"), col("value"))
    val names = scanOf(df).scan.readSchema().fieldNames.toSet
    assert(names === Set("station_id", "value"), names.toString)
  }

  test("pruned scan returns exactly the rows the predicate selects") {
    // Pruning keeps whole partitions; the residual row-level filter
    // must still trim them to the exact bound — including a bound that
    // splits a partition.
    val n = synth(100000, 16).filter(col("id") >= 12345L && col("id") < 23456L)
      .count()
    assert(n === 23456L - 12345L)
  }

  test("generated rows are the documented pure function of the index") {
    val r = synth(1000).filter(col("id") === 421L).collect().head
    assert(r.getAs[Int]("station_id") === SynthSource.stationOf(421L))
    assert(r.getAs[Double]("value") === SynthSource.valueOf(421L))
    assert(r.getAs[java.sql.Timestamp]("ts").getTime ===
      SynthSource.tsOf(421L) / 1000L)
  }
}
