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
}
