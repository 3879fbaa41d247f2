package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Table-maintenance operations over a [[ManifestSink]] history table
  * — the VACUUM / expire-snapshots side of the snapshot log, the op
  * every production table format ships because time travel is a lease,
  * not a mortgage: superseded data must eventually be reclaimed or a
  * 100 TB table with daily rewrites stores every byte it ever held.
  *
  * Correctness contract (the same one Iceberg's `expireSnapshots` and
  * Delta's `VACUUM` state):
  *  - the head snapshot and the newest `keepLast` versions stay
  *    readable, bit-for-bit;
  *  - expired version manifests are deleted, so an expired time-travel
  *    read fails LOUDLY (it can never silently serve partial data —
  *    the manifest, not the directory listing, is the read plan);
  *  - a data file is deleted only when NO retained snapshot references
  *    it — reference counting over manifests, never age heuristics on
  *    file timestamps;
  *  - unreferenced files include orphans from failed/aborted write
  *    attempts (staged but never committed), so vacuum is also the
  *    janitor for crash debris.
  *
  * Metadata-only: the decision reads manifests (KBs), never data
  * files, so the op costs O(snapshots + files-in-dir) driver work at
  * any table size.
  */
object ManifestMaintenance {

  /** Result of one expire run. */
  final case class ExpireStats(
      versionsExpired: Int, filesDeleted: Int, versionsRetained: Int)

  /** Expire all but the newest `keepLast` snapshot versions at `dir`,
    * then delete every `part-*.csv` not referenced by a retained
    * manifest (including never-committed orphans). */
  def expireSnapshots(conf: Configuration, dir: String,
      keepLast: Int): ExpireStats = {
    require(keepLast >= 1, "must retain at least the head snapshot")
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val versions = ManifestSink.listVersions(conf, dir)
    val (expire, retain) =
      versions.splitAt(math.max(0, versions.length - keepLast))

    // set of data files any retained snapshot (or the head) references
    val referenced: Set[String] =
      (retain.map(v => ManifestSink.readManifest(conf, dir, Some(v))) :+
        ManifestSink.readManifest(conf, dir, None))
        .flatten.map(p => new Path(p._1).getName).toSet

    expire.foreach(v => fs.delete(new Path(d, ManifestSink.versionFile(v)), false))

    var deleted = 0
    fs.listStatus(d).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("part-") && name.endsWith(".csv") &&
          !referenced.contains(name)) {
        if (fs.delete(st.getPath, false)) deleted += 1
      }
    }
    ExpireStats(expire.length, deleted, retain.length)
  }
}
