package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.sources.ManifestSink

/** DSv2 sink commit-protocol guarantees (the parts an oracle can't
  * see): staged files match the manifest exactly, the manifest is the
  * only visibility point, and overwrite truncates stale state. */
class ManifestSinkSpec extends SparkSpec {

  private def writeOnce(target: String, parts: Int): Unit =
    Tables.events(spark, Sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .repartition(parts)
      .write.format("graft.sources.ManifestSink")
      .option("path", target).mode("overwrite").save()

  test("manifest totals equal the written data; every listed file exists") {
    val target = Files.createTempDirectory("graft-sink-spec-").toString
    writeOnce(target, 4)
    val m = ManifestSink.readManifest(
      spark.sparkContext.hadoopConfiguration, target)
    assert(m.size === 4, "one manifest entry per writer task")
    val expected = Tables.events(spark, Sf0001).count()
    assert(m.map(_._2).sum === expected)
    m.foreach { case (p, _, _, _) =>
      assert(Files.exists(Paths.get(p.stripPrefix("file:"))), s"missing $p")
    }
    val nonEmpty = m.filter(_._2 > 0)
    assert(nonEmpty.map(_._3).min === 0L, "global key min via per-file stats")
  }

  test("orphan files are invisible: the manifest is the commit point") {
    val target = Files.createTempDirectory("graft-sink-spec-").toString
    writeOnce(target, 2)
    // simulate a failed/speculative attempt's leftover staging file
    Files.write(Paths.get(target, "part-9-999.csv"),
      "999999,ghost,1.0\n".getBytes("UTF-8"))
    val m = ManifestSink.readManifest(
      spark.sparkContext.hadoopConfiguration, target)
    assert(!m.exists(_._1.contains("part-9-999")),
      "uncommitted attempts must not appear in the manifest")
    assert(m.map(_._2).sum === Tables.events(spark, Sf0001).count(),
      "orphans must not change committed totals")
  }

  test("overwrite truncates: second write leaves no stale part files") {
    val target = Files.createTempDirectory("graft-sink-spec-").toString
    writeOnce(target, 4)
    writeOnce(target, 2)
    val m = ManifestSink.readManifest(
      spark.sparkContext.hadoopConfiguration, target)
    assert(m.size === 2)
    val onDisk = Files.list(Paths.get(target)).toArray.map(_.toString)
      .filter(_.endsWith(".csv")).toSet
    val listed = m.map(_._1.stripPrefix("file:")).toSet
    assert(onDisk === listed,
      s"disk/manifest divergence: disk=$onDisk manifest=$listed")
  }

  test("clusterBy: the SINK demands the sorted layout; parts own disjoint ranges") {
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val target = java.nio.file.Files
      .createTempDirectory("graft-sink-cluster-").toString
    // deliberately HASH-scrambled input: the layout must come from the
    // sink's required distribution, not from the caller
    Tables.events(spark, Sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .repartition(7, col("event_type"))
      .write.format("graft.sources.ManifestSink")
      .option("path", target)
      .option("clusterBy", "event_id").option("writePartitions", "6")
      .mode("overwrite").save()
    val conf = spark.sessionState.newHadoopConf()
    val parts = graft.sources.ManifestSink.readManifest(conf, target)
      .sortBy(_._3)
    assert(parts.size === 6, s"writePartitions must hold: ${parts.size}")
    // disjoint, ordered key ranges — the stats-prunable layout
    parts.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 < b._3,
        s"ranges must be disjoint: ${a._1}=[${a._3},${a._4}] vs " +
          s"${b._1}=[${b._3},${b._4}]")
      case _ => ()
    }
    // and the point probe proves it: one planned part
    val minId = parts.map(_._3).min
    val probe = spark.read.format("graft.sources.ManifestSource")
      .option("path", target).load()
      .filter(col("event_id") === minId)
    val planned = probe.queryExecution.executedPlan
      .collectFirst { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .get.inputPartitions.length
    assert(planned === 1, s"clustered layout must prune to 1 part, got $planned")
    assert(probe.count() >= 1)
    // a clusterBy column absent from the schema fails loudly
    intercept[IllegalArgumentException] {
      Tables.events(spark, Sf0001).select(col("event_id"))
        .write.format("graft.sources.ManifestSink")
        .option("path", target).option("clusterBy", "nope")
        .mode("overwrite").save()
    }
  }
}
