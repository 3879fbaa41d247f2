package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** [[ManifestMaintenance.cherrypick]] — the WAP publish for a main
  * line that advanced since the fork. Pinned at the API level (the
  * pick is pure manifest algebra):
  *
  *  - only the picked snapshot's APPEND DELTA lands on main; the
  *    interleaved main commits survive (the exact rows fast_forward
  *    would drop);
  *  - the delta base is the previous branch snapshot when one exists,
  *    else the fork point RECONSTRUCTED from the immutable main log
  *    (newest main snapshot bit-identically contained in the pick);
  *  - non-append branch snapshots (dropped or restated lines), picks
  *    whose delta already landed, diverged schemas, and empty deltas
  *    all refuse loudly — a silent wrong publish is the one failure
  *    mode WAP exists to prevent.
  */
class CherrypickSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val schema = StructType.fromDDL("k BIGINT")
  private def pm(p: String, rows: Long = 1L) = PartMeta(p, rows, 0L, 0L, "")
  private def headPaths(dir: String): Set[String] =
    ManifestSink.readManifestMeta(conf, dir, None).map(_.path).toSet
  private def commit(dir: String, f: Seq[PartMeta] => Seq[PartMeta],
      branch: Option[String] = None): Int =
    ManifestSink.publishRebase(conf, dir, schema, history = true,
      rebase = f, strictBase = None, branch = branch)

  test("pick lands the branch delta on an advanced main; interleaved commit survives") {
    val dir = Files.createTempDirectory("graft-pick-").toString
    commit(dir, _ => Seq(pm("a")))                    // main v1 = {a}
    commit(dir, h => h :+ pm("f1", 7L), Some("fix"))  // fix v1 = {a, f1}
    commit(dir, h => h :+ pm("b"))                    // main v2 = {a, b}
    val st = ManifestMaintenance.cherrypick(conf, dir, "fix")
    assert(st.version === 3 && st.partsAdded === 1 && st.rowsAdded === 7L)
    assert(headPaths(dir) === Set("a", "b", "f1"),
      "interleaved main part b must survive the pick")
    assert(ManifestSink.readOp(conf, dir, Some(3)) === "cherrypick")
  }

  test("second branch snapshot diffs against the previous one, not main") {
    val dir = Files.createTempDirectory("graft-pick-").toString
    commit(dir, _ => Seq(pm("a")))                    // main v1
    commit(dir, h => h :+ pm("f1"), Some("fix"))      // fix v1
    commit(dir, h => h :+ pm("f2", 3L), Some("fix"))  // fix v2
    commit(dir, h => h :+ pm("b"))                    // main v2
    val st = ManifestMaintenance.cherrypick(conf, dir, "fix", version = 2)
    assert(st.partsAdded === 1 && st.rowsAdded === 3L,
      "picking fix@2 must deliver only f2, not f1")
    assert(headPaths(dir) === Set("a", "b", "f2"))
  }

  test("a branch snapshot that dropped or restated fork lines refuses") {
    val dir = Files.createTempDirectory("graft-pick-").toString
    commit(dir, _ => Seq(pm("a"), pm("b")))           // main v1
    // branch DML: replaces part a — not expressible as an append
    commit(dir, h => h.filterNot(_.path == "a") :+ pm("a2"), Some("dml"))
    val ex = intercept[IllegalArgumentException] {
      ManifestMaintenance.cherrypick(conf, dir, "dml")
    }
    assert(ex.getMessage.contains("no main snapshot"))
    assert(headPaths(dir) === Set("a", "b"), "refusal publishes nothing")
    // branch restating a line in place (same path, new record) refuses too
    commit(dir, h => h.map(p =>
      if (p.path == "a") p.copy(rows = 99L) else p) :+ pm("c"), Some("re"))
    val ex2 = intercept[IllegalArgumentException] {
      ManifestMaintenance.cherrypick(conf, dir, "re")
    }
    assert(ex2.getMessage.contains("no main snapshot"))
  }

  test("double pick refuses: the delta is already on main") {
    val dir = Files.createTempDirectory("graft-pick-").toString
    commit(dir, _ => Seq(pm("a")))
    commit(dir, h => h :+ pm("f1"), Some("fix"))
    ManifestMaintenance.cherrypick(conf, dir, "fix")
    // re-pick of a FIRST branch snapshot: fork reconstruction now
    // finds the post-pick main head as the base, so the delta is
    // empty — refused before any version claim
    val ex = intercept[IllegalArgumentException] {
      ManifestMaintenance.cherrypick(conf, dir, "fix")
    }
    assert(ex.getMessage.contains("adds no parts"))
    assert(ManifestSink.listVersions(conf, dir).last === 2,
      "failed pick must not claim a version")
    // re-pick of a LATER branch snapshot diffs against branch-prev,
    // so its delta survives reconstruction and the already-on-main
    // dup guard is what refuses
    commit(dir, h => h :+ pm("f2"), Some("fix"))      // fix v2
    ManifestMaintenance.cherrypick(conf, dir, "fix", version = 2)
    assert(headPaths(dir) === Set("a", "f1", "f2"))
    val ex2 = intercept[IllegalArgumentException] {
      ManifestMaintenance.cherrypick(conf, dir, "fix", version = 2)
    }
    assert(ex2.getMessage.contains("already committed on main"))
  }

  test("schema divergence and empty deltas refuse") {
    val dir = Files.createTempDirectory("graft-pick-").toString
    commit(dir, _ => Seq(pm("a")))
    commit(dir, h => h :+ pm("f1"), Some("fix"))
    // main evolves its schema after the fork
    ManifestSink.publishRebase(conf, dir,
      StructType.fromDDL("k BIGINT, s STRING"), history = true,
      rebase = h => h, strictBase = None)
    val ex = intercept[IllegalArgumentException] {
      ManifestMaintenance.cherrypick(conf, dir, "fix")
    }
    assert(ex.getMessage.contains("diverged"))
    // a no-op branch snapshot has nothing to pick
    val dir2 = Files.createTempDirectory("graft-pick-").toString
    commit(dir2, _ => Seq(pm("a")))
    commit(dir2, h => h, Some("noop"))
    val ex2 = intercept[IllegalArgumentException] {
      ManifestMaintenance.cherrypick(conf, dir2, "noop")
    }
    assert(ex2.getMessage.contains("adds no parts"))
  }
}
