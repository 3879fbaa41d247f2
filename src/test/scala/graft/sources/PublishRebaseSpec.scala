package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The commit loop's refresh-and-reapply contract, pinned at the API
  * level (no Spark session needed — the loop is pure Hadoop-FS):
  *
  *  - a committer that lands between our base-snapshot read and our
  *    claim must keep its parts — the retry recomputes the published
  *    list on top of the winner's snapshot (the lost-update Iceberg's
  *    commit loop exists to prevent);
  *  - an operation that CANNOT be re-applied (strictBase) must fail
  *    loudly when the head advances, never publish a half-stale list;
  *  - string-stat comparisons are UTF-8 byte order on BOTH sides
  *    (StrBin), because Java String order disagrees on supplementary
  *    characters and would mis-prune.
  */
class PublishRebaseSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val schema = StructType.fromDDL("k BIGINT")
  private def pm(p: String) = PartMeta(p, 1L, 0L, 0L, "")
  private def headPaths(dir: String): Set[String] =
    ManifestSink.readManifestMeta(conf, dir, None).map(_.path).toSet

  test("a racer landing between base read and claim is rebased over, not dropped") {
    val dir = Files.createTempDirectory("graft-rebase-").toString
    ManifestSink.publishRebase(conf, dir, schema, history = true,
      _ => Seq(pm("a")), strictBase = None) // v1 = {a}
    var raced = false
    val v = ManifestSink.publishRebase(conf, dir, schema, history = true,
      head => {
        if (!raced) {
          raced = true
          // the racer: commits {a, b} AFTER our head read — our claim
          // of its slot must fail and the retry must see part b
          ManifestSink.publishRebase(conf, dir, schema, history = true,
            h => h :+ pm("b"), strictBase = None) // v2 = {a, b}
        }
        head :+ pm("c")
      }, strictBase = None)
    assert(v === 3, "loser must land at the next free slot")
    assert(headPaths(dir) === Set("a", "b", "c"),
      "the racer's part must survive the rebased commit")
    assert(ManifestSink.readManifestMeta(conf, dir, Some(2))
      .map(_.path).toSet === Set("a", "b"), "racer snapshot intact")
  }

  test("strictBase fails loudly when the head advances mid-operation") {
    val dir = Files.createTempDirectory("graft-rebase-").toString
    ManifestSink.publishRebase(conf, dir, schema, history = true,
      _ => Seq(pm("a")), strictBase = None) // v1
    ManifestSink.publishRebase(conf, dir, schema, history = true,
      _ => Seq(pm("b")), strictBase = None) // v2: head moved past base=1
    val ex = intercept[java.util.ConcurrentModificationException] {
      ManifestSink.publishRebase(conf, dir, schema, history = true,
        _ => Seq(pm("stale")), strictBase = Some(1))
    }
    assert(ex.getMessage.contains("advanced from snapshot 1 to 2"))
    assert(headPaths(dir) === Set("b"), "failed commit must publish nothing")
  }

  test("StrBin compares in UTF-8 byte order where String order disagrees") {
    val emoji = "\uD83D\uDE00" // U+1F600, UTF-8 F0 9F 98 80
    val pua = "\uE000"         // U+E000,  UTF-8 EE 80 80
    assert(emoji < pua, "UTF-16 code-unit order: emoji below U+E000")
    assert(StrBin.cmp(emoji, pua) > 0, "UTF-8 byte order: emoji above")
    assert(StrBin.min(emoji, pua) === pua)
    assert(StrBin.max(emoji, pua) === emoji)
    // the writer's stats for rows {pua, emoji} are (pua, emoji) in
    // UTF-8 order; an equality probe for the emoji must overlap
    val part = PartMeta("p", 2L, 0L, 0L, "", Some(pua), Some(emoji))
    assert(part.strOverlaps(Some(emoji), Some(emoji)),
      "UTF-16 comparison would prune the part that holds the row")
    assert(!part.strOverlaps(Some(emoji + "z"), None),
      "probes above the UTF-8 max still prune")
  }
}
