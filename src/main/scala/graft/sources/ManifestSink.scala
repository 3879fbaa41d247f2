package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 SINK with a manifest commit protocol — the
  * write-side extension point next to [[SynthSource]]'s read side.
  * It models the reference's K1 keyed sink
  * (/root/reference/queue_time_predictions/preprocess_image.py:139-151
  * save to a well-known target) the way a cluster warehouse commits:
  *
  *  - every task stages its own uniquely-named part file
  *    (`part-<partition>-<task>`): task retries / speculative
  *    duplicates can never collide or corrupt committed data;
  *  - each task's DataWriter.commit() returns a
  *    [[PartCommit]] message carrying (rows, key min/max, path) —
  *    per-partition statistics computed WHILE writing, the footer
  *    metadata every modern table format keeps;
  *  - the driver's BatchWrite.commit() writes `_MANIFEST.json` LAST,
  *    listing the table schema plus exactly the committed attempts —
  *    the manifest is the atomic publish point, so readers either see
  *    the full dataset or none of it, and orphaned files from failed
  *    attempts are invisible (abort() deletes what it can; correctness
  *    never depends on that cleanup).
  *
  * Filesystem access uses the SESSION Hadoop configuration end to end:
  * captured once on the driver (`sessionState.newHadoopConf()`, which
  * layers `spark.hadoop.*` onto the defaults) and shipped to executor
  * writers via [[SerializableConfiguration]]. A bare
  * `new Configuration()` would silently drop the session's filesystem
  * settings (credentials, `fs.*` implementations, buffer sizing) — on
  * a real cluster that is the difference between writing the user's
  * warehouse and writing nothing.
  *
  * At 100 TB this protocol is the difference between "a job died and
  * the table is half-visible" and exactly-once table semantics. The
  * sandbox writer serializes rows as escaped text (atomic column
  * types — see [[ManifestCodec]]); the protocol, not the encoding, is
  * the operator. [[ManifestSource]] is the matching read path: it
  * plans one input partition per committed part and prunes parts
  * whose (key min, key max) range cannot satisfy the pushed filters.
  */
class ManifestSink extends TableProvider {
  // the write schema comes from the DataFrame being written
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"), schema,
      "true".equalsIgnoreCase(properties.get("history")),
      Option(properties.get("clusterBy")).filter(_.nonEmpty),
      Option(properties.get("writePartitions")).map(_.toInt),
      Option(properties.get("branch")).filter(_.nonEmpty),
      Option(properties.get("buckets")).map(_.toInt),
      Option(properties.get("splitBy")).filter(_.nonEmpty),
      Option(properties.get("splitTransform")).filter(_.nonEmpty))
}

/** Per-part bloom filter over the key column, stored hex-encoded in
  * the manifest line — the point-lookup companion to the (min, max)
  * zone map: a hash-layout part spans nearly the full key range, so
  * range stats never prune it, but a `key = v` / `key IN (...)` probe
  * can still skip every part whose bloom proves absence. False
  * positives only cost an extra part read; absence proofs are exact,
  * so pruning is never a correctness decision (the filters stay
  * residual regardless).
  *
  * Sizing: built at [[MaxBits]] during the streaming write (the
  * writer can't know its final row count up front), then FOLDED to
  * `clamp(nextPow2(10·rows), MinBits, MaxBits)` at commit — all sizes
  * are powers of two and indices are `h & (bits−1)`, so OR-ing the
  * two halves of a 2m-bit filter yields EXACTLY the m-bit filter a
  * direct build would produce ((x mod 2m) mod m = x mod m). At
  * ~10 bits/key the fp rate is ~1%; beyond [[MaxBits]]/10 keys per
  * part the filter saturates GRACEFULLY (mightContain → true ≈
  * no-index behavior, never wrong). A production format would spill
  * big filters to side files (Iceberg's puffin shape) rather than
  * inline them; the manifest stays metadata-small at this cap
  * (≤16 KiB hex per part). */
private[sources] object PartBloom {
  val MaxBits = 1 << 16
  val MinBits = 1 << 10
  val HashCount = 3

  /** splitmix64 finalizer — well-mixed 64-bit hash of the key, one
    * stream per hash index. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def hash(key: Long, i: Int): Long = mix(key + i * 0xc2b2ae3d27d4eb4fL)

  def newBits(): Array[Long] = new Array[Long](MaxBits / 64)
  /** Power-of-two sized allocation for declared-size secondary
    * blooms; shrinkFor folds down from whatever was allocated. */
  def newBits(bits: Int): Array[Long] = new Array[Long](bits / 64)

  def add(bits: Array[Long], key: Long): Unit = {
    val nbits = bits.length * 64
    var i = 0
    while (i < HashCount) {
      val idx = (hash(key, i) & (nbits - 1)).toInt
      bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Stable FNV-1a 64-bit hash of a string's UTF-8 bytes — the key
    * form secondary-column STRING blooms feed to add/mightContain.
    * Deterministic across JVMs and releases (the hex survives in
    * committed manifests), unlike String.hashCode's 32 bits. */
  def strKey(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  def strKey(s: String): Long =
    strKey(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  def mightContain(bits: Array[Long], key: Long): Boolean = {
    val nbits = bits.length * 64
    var i = 0
    while (i < HashCount) {
      val idx = (hash(key, i) & (nbits - 1)).toInt
      if ((bits(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Fold to the commit-time target size for `rows` keys — capped at
    * whatever was ALLOCATED (so declared-size secondary blooms keep
    * their larger width when the key count warrants it). */
  def shrinkFor(bits: Array[Long], rows: Long): Array[Long] = {
    val want = math.min((bits.length * 64).toLong,
      math.max(MinBits.toLong, java.lang.Long.highestOneBit(
        math.max(1L, 10L * rows - 1)) * 2)).toInt
    var cur = bits
    while (cur.length * 64 > want) {
      val half = new Array[Long](cur.length / 2)
      var i = 0
      while (i < half.length) { half(i) = cur(i) | cur(i + half.length); i += 1 }
      cur = half
    }
    cur
  }

  def toHex(bits: Array[Long]): String = {
    val sb = new StringBuilder(bits.length * 16)
    bits.foreach(w => sb.append(f"$w%016x"))
    sb.toString
  }

  /** "" (absent field / legacy manifest) → empty array = "no filter". */
  def fromHex(s: String): Array[Long] =
    if (s == null || s.isEmpty) Array.empty
    else Array.tabulate(s.length / 16)(i =>
      java.lang.Long.parseUnsignedLong(s.substring(i * 16, i * 16 + 16), 16))
}

/** UTF-8 byte-order string comparison — the ONE collation every side
  * of string-stats pruning uses. The writer tracks sMin/sMax with
  * UTF8String.compareTo (UTF-8 byte order); Java String's natural
  * order is UTF-16 code-unit order, which DISAGREES for supplementary
  * characters (U+10000+, surrogate pairs 0xD800–0xDFFF as code units)
  * vs chars in U+E000–U+FFFF — comparing stats with String operators
  * could prune a part that actually contains matching rows. Both
  * [[PartMeta.strOverlaps]] and the scan builder's bound intersection
  * route through here so stats and predicates always agree. */
private[sources] object StrBin {
  import org.apache.spark.unsafe.types.UTF8String
  def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b))
  def min(a: String, b: String): String = if (cmp(a, b) <= 0) a else b
  def max(a: String, b: String): String = if (cmp(a, b) >= 0) a else b
}

/** PER-COLUMN min/max stats beyond the primary key/string pair — the
  * generalized data-skipping record every modern table format keeps
  * per file: the writer tracks every additional LongType ('l') and
  * StringType ('s') column while streaming rows out, and the scan
  * prunes parts on predicates over ANY of them, not just the first.
  * Bounds cover the part's NON-NULL values (comparisons are never
  * TRUE for NULL, so skipping is 3VL-safe); an ABSENT entry means
  * "no non-null values in this part" OR "written before stats
  * existed" — both read as "cannot prune", never as "no rows match".
  * Deletion vectors only narrow a part's live set, so the recorded
  * bounds stay conservative (wider-than-live is always prune-safe).
  * Encoding is additive on the manifest line (`"cstats":"…"`): old
  * manifests parse unchanged and simply never column-prune. */
private[sources] final case class ColStat(kind: Char, min: String,
    max: String, nulls: Long = -1L, sum: Option[Long] = None,
    bloom: String = "") {
  def lMin: Long = min.toLong
  def lMax: Long = max.toLong
}

private[sources] object ColStat {
  import java.net.{URLDecoder, URLEncoder}
  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  /** `col=k:min:max&col2=…` with every free-form token URL-encoded —
    * the blob is then URL-encoded ONCE MORE onto the manifest line,
    * so the line's regex field parser never sees a comma or quote. */
  def encode(m: Map[String, ColStat]): String =
    m.toSeq.sortBy(_._1).map { case (c, st) =>
      // the 4th token (null count) and 5th token (long-column SUM)
      // are OPTIONAL and positional — a sum with an UNKNOWN null
      // count encodes a `?` placeholder in the 4th slot so the sum
      // is never silently dropped (decoders read `?` back as
      // unknown); unknown decoders of FUTURE extra tokens must
      // ignore them, which `decode` below guarantees
      val n = if (st.nulls >= 0) st.nulls.toString else "?"
      val sm = st.sum.map(_.toString).getOrElse("?")
      // emit the positional tail only through the LAST present leg,
      // with `?` placeholders filling gaps — byte-identical to the
      // pre-bloom encoding for bloom-free stats. The 6th leg is the
      // SECONDARY-COLUMN BLOOM (hex, URL-safe by construction):
      // per-part membership filter for declared high-cardinality
      // columns (`graft.bloom_cols`), consulted by point lookups
      // where min/max ranges admit nearly everything.
      val tail =
        if (st.bloom.nonEmpty) s":$n:$sm:${st.bloom}"
        else if (st.sum.isDefined) s":$n:$sm"
        else if (st.nulls >= 0) s":$n"
        else ""
      s"${enc(c)}=${st.kind}:${enc(st.min)}:${enc(st.max)}$tail"
    }.mkString("&")

  /** Unknown-null placeholder read-back: `?` → -1 (untracked). */
  private def nl(n: String): Long = if (n == "?") -1L else n.toLong

  def decode(blob: String): Map[String, ColStat] =
    if (blob.isEmpty) Map.empty
    else blob.split('&').iterator.map { entry =>
      val eq = entry.indexOf('=')
      // limit -1: an EMPTY string min/max is a legal stat value and
      // must survive the split (trailing empties are dropped otherwise).
      // TRAILING tokens beyond the 5 this version knows are IGNORED,
      // not rejected — future stat legs stay additive for old readers
      // (a v+1 writer's 6-token blob reads fine here, minus the new leg)
      val st = entry.drop(eq + 1).split(":", -1) match {
        case Array(k, mn, mx)    => ColStat(k.head, dec(mn), dec(mx))
        case Array(k, mn, mx, n) => ColStat(k.head, dec(mn), dec(mx), nl(n))
        case arr @ Array(k, mn, mx, n, sm, _*) =>
          ColStat(k.head, dec(mn), dec(mx), nl(n),
            if (sm == "?" || sm.isEmpty) None else Some(sm.toLong),
            bloom = if (arr.length >= 6) arr(5) else "")
        case other => throw new IllegalArgumentException(
          s"bad ColStat entry '$entry' (${other.length} tokens)")
      }
      dec(entry.take(eq)) -> st
    }.toMap
}

/** DELETION VECTOR codec: a bitmap over a part's row ORDINALS (line
  * numbers 0..rows-1), hex-encoded in the manifest line — the
  * merge-on-read DELETE representation (Delta deletion vectors /
  * Iceberg positional deletes): a delete is a METADATA commit that
  * flips bits instead of rewriting data files; every reader masks the
  * flagged ordinals. A production format spills big vectors to side
  * files (the same note as [[PartBloom]]); inline hex keeps the
  * sandbox manifest self-contained (8 KiB per 64k-row part, and only
  * on parts that actually have deletes). */
private[sources] object DeleteVector {
  def empty: Array[Long] = Array.empty

  def isDeleted(bits: Array[Long], ordinal: Long): Boolean = {
    val w = (ordinal >>> 6).toInt
    w < bits.length && (bits(w) & (1L << (ordinal & 63))) != 0L
  }

  def popCount(bits: Array[Long]): Long =
    bits.foldLeft(0L)((acc, w) => acc + java.lang.Long.bitCount(w))

  def fromOrdinals(ordinals: Iterable[Long], rows: Long): Array[Long] = {
    val bits = new Array[Long]((((rows - 1) >>> 6) + 1).toInt)
    ordinals.foreach { o =>
      require(o >= 0 && o < rows, s"ordinal $o outside part of $rows rows")
      bits((o >>> 6).toInt) |= 1L << (o & 63)
    }
    bits
  }

  /** Bitwise OR — merging a new delete into an existing vector. */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.max(a.length, b.length))
    a.indices.foreach(i => out(i) |= a(i))
    b.indices.foreach(i => out(i) |= b(i))
    out
  }

  /** Ordinals in `next` but not `prev` — the precise row-level CDC
    * delta a deletion-vector commit produces. */
  def minus(next: Array[Long], prev: Array[Long]): Array[Long] =
    next.zipWithIndex.map { case (w, i) =>
      w & ~(if (i < prev.length) prev(i) else 0L)
    }

  def toHex(bits: Array[Long]): String = PartBloom.toHex(bits)
  def fromHex(s: String): Array[Long] = PartBloom.fromHex(s)

  /** Sidecar file prefix — vacuum recognizes vector sidecars by it. */
  val SidecarPrefix = "dv-"

  /** Write a vector SIDECAR file (hex text) atomically: stage under a
    * dot-temp name, rename in. Executors call this — the 100 TB MOR
    * shape is "executors write DV side files, the manifest carries
    * references", so driver memory never scales with deleted rows.
    * Returns the sidecar's absolute path. */
  def writeRef(conf: Configuration, dir: String, name: String,
      bits: Array[Long]): String = {
    val target = new Path(dir, name)
    val fs = target.getFileSystem(conf)
    val tmp = new Path(dir,
      s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(toHex(bits).getBytes("UTF-8")) finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) throw new java.io.IOException(
      s"cannot publish deletion-vector sidecar $target")
    target.toString
  }

  /** Read a sidecar back into a bitmap. */
  def readRef(conf: Configuration, ref: String): Array[Long] = {
    val p = new Path(ref)
    val in = p.getFileSystem(conf).open(p)
    val hex = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    fromHex(hex)
  }

  /** The one vector resolver every consumer routes through: sidecar
    * reference if present, else the inline hex. */
  def load(conf: Configuration, m: PartMeta): Array[Long] =
    if (m.dvRef.nonEmpty) readRef(conf, m.dvRef) else m.dvBits
}

/** One committed part's full manifest record. `bloomHex` is "" when
  * the part predates the bloom field or the table has no key column —
  * [[mayContain]] then degrades to the pure range check. `sMin`/`sMax`
  * are binary-collation min/max of the first STRING column (None when
  * the part predates the field, has no string column, or saw only
  * NULLs) — the reader prunes string predicates on them exactly like
  * the long key range, and None always means "cannot exclude".
  * `dvHex` is the part's DELETION VECTOR ("" = nothing deleted);
  * `rows` stays the PHYSICAL line count — [[visibleRows]] is the
  * served count, and all other stats become safe OVER-approximations
  * once a vector exists (pruning may only over-include; exact
  * metadata answers must consult [[visibleRows]] or decline).
  * `kSum` is the exact sum of the key column's non-null values
  * (None = untracked/legacy, or the per-part sum overflowed a Long
  * while streaming) — the 4th leg of the file-stats record that
  * turns a global SUM into a metadata-only answer; secondary long
  * columns carry theirs in [[ColStat.sum]]. */
/** EQUALITY-DELETE clause pending on a part (the Iceberg v2
  * equality-delete shape): "rows where column <fieldId> equals any of
  * `values` are deleted" — committed as METADATA on the part line
  * with no data read or written, applied by every reader as a
  * row-level mask on top of the deletion vector. `col` is the logical
  * name AT COMMIT TIME (audit display only); resolution is by STABLE
  * FIELD ID so the mask survives later RENAME/DROP (a part never
  * gains clauses after commit, so its recorded layout fully resolves
  * the id). `values` are RAW decoded strings ('l' = canonical decimal
  * for a BIGINT column, 's' = the string itself); readers canonicalize
  * to the line-token form once per part, then compare raw tokens —
  * zero per-row decode. Kind 'L' is the RANGE clause (BIGINT only):
  * `values` = Seq(lo, hi), the canonical INCLUSIVE interval — "rows
  * whose value ∈ [lo, hi] are deleted" (the `ts < cutoff` retention
  * shape; see [[ManifestEq.translateRange]]). Clauses COMPOSE: each
  * eq DELETE appends one; compaction materializes and clears them. */
private[sources] final case class EqClause(
    col: String, fieldId: Int, kind: Char, values: Seq[String])

private[sources] object EqClause {
  import java.net.{URLDecoder, URLEncoder}
  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  /** `enc(col):id:kind:enc(v1)|enc(v2);next...` — the blob is then
    * URL-encoded once more onto the manifest line (like cstats), so
    * the line's field regex never sees its separators. */
  def encode(cs: Seq[EqClause]): String =
    cs.map(c => s"${enc(c.col)}:${c.fieldId}:${c.kind}:" +
      c.values.map(enc).mkString("|")).mkString(";")

  def decode(blob: String): Seq[EqClause] =
    if (blob.isEmpty) Seq.empty
    else blob.split(';').toSeq.map { s =>
      val Array(c, id, k, vs) = s.split(":", 4)
      EqClause(dec(c), id.toInt, k.head,
        if (vs.isEmpty) Seq.empty else vs.split('|').toSeq.map(dec))
    }
}

private[sources] final case class PartMeta(
    path: String, rows: Long, kMin: Long, kMax: Long, bloomHex: String,
    sMin: Option[String] = None, sMax: Option[String] = None,
    dvHex: String = "", dvRef: String = "", dvCard: Long = 0L,
    bytes: Long = 0L, bucket: Int = -1, nbuckets: Int = 0,
    sorted: Boolean = false,
    cstats: Map[String, ColStat] = Map.empty,
    cols: Seq[Int] = Seq.empty,
    kNulls: Long = -1L, sNulls: Long = -1L,
    kSum: Option[Long] = None,
    eq: Seq[EqClause] = Seq.empty,
    /** NESTED line sub-layouts: parent field id -> the nested field
      * ids of the struct token's sub-slots as written. Absent entry ⇒
      * identity (sub-slot = nested id) — the legacy rule one level
      * down; see [[ColMap.nested]]. */
    ncols: Map[Int, Seq[Int]] = Map.empty) {
  lazy val bloomBits: Array[Long] = PartBloom.fromHex(bloomHex)
  lazy val dvBits: Array[Long] = DeleteVector.fromHex(dvHex)
  /** A vector exists — inline (`dvHex`) or as a SIDECAR file
    * (`dvRef` + its cached cardinality `dvCard`). The sidecar is the
    * at-scale shape: executors write the bitmap, the manifest carries
    * only the reference, and metadata answers (visibleRows) come from
    * the cardinality without opening the sidecar. */
  def hasDv: Boolean = dvHex.nonEmpty || dvRef.nonEmpty
  def dvCount: Long =
    if (dvRef.nonEmpty) dvCard else DeleteVector.popCount(dvBits)
  /** Served row count — EXACT unless equality-delete clauses are
    * pending ([[eq]] non-empty), in which case it is an
    * OVER-approximation (matches are unknown without a scan): safe
    * for budgets/limits/pruning, but exact metadata answers must
    * consult [[countsExact]] and decline. */
  def visibleRows: Long = rows - dvCount
  def countsExact: Boolean = eq.isEmpty
  def mayContain(v: Long): Boolean =
    v >= kMin && v <= kMax &&
      (bloomBits.isEmpty || PartBloom.mightContain(bloomBits, v))
  /** Can this part contain a string-key row within [lo, hi]? (UTF-8
    * byte-order compare via [[StrBin]] — the writer's collation —
    * bounds inclusive; absent stats never exclude). */
  def strOverlaps(lo: Option[String], hi: Option[String]): Boolean =
    (sMin, sMax) match {
      case (Some(mn), Some(mx)) =>
        hi.forall(h => StrBin.cmp(mn, h) <= 0) &&
          lo.forall(l => StrBin.cmp(mx, l) >= 0)
      case _ => true
    }
}

/** COLUMN MAPPING (the Delta column-mapping / Iceberg field-id shape):
  * every column carries a STABLE FIELD ID, allocated at creation and
  * never reused, so RENAME and DROP COLUMN become metadata-only
  * commits — no data file is read or written by either.
  *
  *  - `ids(i)` is the field id of logical field i of the snapshot's
  *    schema; readers resolve a logical column to a part's line slot
  *    through the part's own recorded layout ([[PartMeta.cols]]), so
  *    parts written under different schema generations decode
  *    correctly side by side.
  *  - `nextId` is the allocation high-water mark: an ADD COLUMN after
  *    a DROP gets a FRESH id, so the dropped column's bytes still
  *    sitting in old parts can never resurrect under the new name.
  *  - `retired` is every name ever dropped or renamed-away: name
  *    reuse is rejected so per-part stats recorded under a name can
  *    never be consulted for a DIFFERENT physical column (pruning
  *    stays provably sound across renames).
  *
  * Absent header ⇒ identity (id = position), which is exactly what
  * additive-only evolution produced — every pre-mapping manifest
  * stays readable unchanged. */
private[sources] final case class ColMap(
    ids: Seq[Int], nextId: Int, retired: Seq[String],
    /** COLUMN DEFAULTS, keyed by STABLE FIELD ID: (currentSql,
      * existsSql). `currentSql` fills omitted columns on WRITE (may
      * be altered/dropped later); `existsSql` is the INITIAL default
      * frozen at ADD COLUMN time — parts written before the column
      * serve it for their missing slot, so adding a defaulted column
      * to a petabyte is a metadata commit, never a backfill. Rides
      * the colmap header, so it versions with the snapshot and
      * travels through every staged read. "" = none on either leg. */
    defaults: Map[Int, (String, String)] = Map.empty,
    /** NESTED FIELD IDS, keyed by the PARENT column's stable field
      * id: depth-1 struct columns evolve exactly like the top level,
      * one level down — `ids(k)` is the nested id of struct field k,
      * `nextId` the allocation high-water mark (nested ADD after a
      * nested DROP gets a fresh id, dropped sub-bytes never
      * resurrect), `retired` the sub-names ever dropped/renamed-away
      * within this struct. Absent entry = identity (nested id =
      * position) — a struct that never evolves costs nothing. The
      * reference's own record is a progressively-enriched struct
      * (estimate_queue.py:80-88); this is its DDL form. */
    nested: Map[Int, ColMap.Nested] = Map.empty) {
  def isIdentity: Boolean = ids == ids.indices
  def isRetired(name: String): Boolean =
    retired.exists(_.equalsIgnoreCase(name))
  /** The nested mapping of parent field id `pid` over an n-field
    * struct — identity when the struct never evolved. */
  def nestedOf(pid: Int, n: Int): ColMap.Nested =
    nested.getOrElse(pid, ColMap.Nested(0 until n, n, Seq.empty))
  /** Must this snapshot materialize a colmap header? */
  def isPlain: Boolean = isIdentity && defaults.isEmpty && nested.isEmpty
}

private[sources] object ColMap {
  def identity(n: Int): ColMap = ColMap(0 until n, n, Seq.empty)
  final case class Nested(ids: Seq[Int], nextId: Int, retired: Seq[String]) {
    def isRetired(name: String): Boolean =
      retired.exists(_.equalsIgnoreCase(name))
  }
}

object ManifestSink {
  val ManifestFile = "_MANIFEST.json"

  /** Immutable snapshot manifest name for version `v` (history mode). */
  def versionFile(v: Int): String = f"_MANIFEST.v$v%05d.json"
  private val VersionRe = """_MANIFEST\.v(\d+)\.json""".r

  /** BRANCH snapshot manifest (write-audit-publish): commits to a
    * named branch claim `_MANIFEST.<branch>.vNNNNN.json` files — their
    * own version sequence, invisible to main-head resolution (the main
    * pattern has no branch segment), sharing the directory and the
    * part files. A branch forks IMPLICITLY from the main head at its
    * first commit and costs one JSON file per commit, never a data
    * copy — the Iceberg named-ref shape. */
  def branchVersionFile(branch: String, v: Int): String =
    f"_MANIFEST.$branch%s.v$v%05d.json"
  private val BranchVersionRe = """_MANIFEST\.([A-Za-z0-9_-]+)\.v(\d+)\.json""".r
  private[sources] def validBranch(b: String): Boolean =
    b.nonEmpty && b.forall(c => c.isLetterOrDigit || c == '_' || c == '-')

  /** The session Hadoop conf, captured on the driver. This is the ONLY
    * conf constructor in the manifest code paths. */
  private[sources] def driverConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** STRUCT columns carry atomic sub-fields only (the line codec is
    * flat — one struct token level). Rejected wherever a schema can
    * first enter the format: CREATE TABLE, staged CTAS/RTAS, and the
    * write path itself ([[ManifestBatchWrite]]) — a deep-nested
    * struct must fail loudly at schema admission, never reach
    * ManifestCodec's generic fallback and write `InternalRow.toString`
    * garbage into a committed part. */
  private[sources] def validateStructDepth(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case st: StructType => st.fields.foreach { sf =>
          sf.dataType match {
            case _: StructType | _: org.apache.spark.sql.types.ArrayType |
                _: org.apache.spark.sql.types.MapType =>
              throw new IllegalArgumentException(
                s"unsupported type for '${f.name}.${sf.name}' " +
                  s"(${sf.dataType.simpleString}): struct fields must " +
                  "be atomic — depth-1 structs only")
            case _ => ()
          }
        }
        case _ => ()
      }
    }

  /** One committed part's stats: (path, rows, keyMin, keyMax). */
  def readManifest(conf: Configuration, dir: String): Seq[(String, Long, Long, Long)] =
    readManifest(conf, dir, None)

  /** Same, against a specific snapshot version (history mode). A
    * request for a version whose manifest file is missing (never
    * committed, or expired by [[ManifestMaintenance]]) fails loudly —
    * silently serving the head instead would be a time-travel
    * correctness bug. */
  /** Paths are URL-encoded inside manifest lines so a table path
    * containing `,` `"` `}` (all legal in POSIX paths) can never
    * corrupt the line-oriented record format; the field regex then
    * only ever sees the percent-encoded form. */
  private[sources] def encPath(p: String): String =
    java.net.URLEncoder.encode(p, "UTF-8")
  private def decPath(p: String): String =
    java.net.URLDecoder.decode(p, "UTF-8")

  def readManifest(conf: Configuration, dir: String,
      version: Option[Int]): Seq[(String, Long, Long, Long)] =
    readManifestMeta(conf, dir, version)
      .map(m => (m.path, m.rows, m.kMin, m.kMax))

  /** Full per-part records including the bloom field. */
  private[sources] def readManifestMeta(conf: Configuration, dir: String,
      version: Option[Int]): Seq[PartMeta] =
    metaFromLines(manifestLines(conf, dir, version))

  /** The MAIN version a branch's first commit forked from (None for
    * legacy branches predating fork recording; 0 = main had no
    * version files yet, i.e. a genuinely-empty fork base). */
  private[sources] def readBranchFork(conf: Configuration, dir: String,
      branch: String): Option[Int] =
    manifestLines(conf, dir, Some(1), Some(branch))
      .find(_.startsWith("{\"version\":"))
      .flatMap(l => """"fork":(\d+)""".r.findFirstMatchIn(l)
        .map(_.group(1).toInt))

  /** The snapshot's operation label ("" for pre-label snapshots). */
  private[sources] def readOp(conf: Configuration, dir: String,
      version: Option[Int]): String =
    manifestLines(conf, dir, version)
      .find(_.startsWith("{\"version\":"))
      .flatMap(l => """"op":"([^"]*)"""".r.findFirstMatchIn(l)
        .map(m => decPath(m.group(1))))
      .getOrElse("")

  /** Parts + (schema, column mapping) from ONE manifest read — the
    * scan planner's shape (a second read of a 100k-part manifest just
    * for the header would double planning IO). */
  private[sources] def readSnapshot(conf: Configuration, dir: String,
      version: Option[Int] = None, branch: Option[String] = None)
      : (Seq[PartMeta], Option[(StructType, ColMap)]) = {
    val lines = manifestLines(conf, dir, version, branch)
    (metaFromLines(lines), schemaFromLines(lines).map { s =>
      (s, colMapFromLines(lines).getOrElse(ColMap.identity(s.fields.length)))
    })
  }

  private def metaFromLines(lines: Seq[String]): Seq[PartMeta] =
    // data records are exactly the lines that START with {"path": —
    // a schema header whose DDL happens to contain the literal text
    // "path" (e.g. a column named path) can never be misclassified
    lines.filter(_.startsWith("{\"path\":")).map { line =>
      def field(k: String): String = {
        val m = ("\"" + k + "\":\"?([^,\"}]*)\"?").r.findFirstMatchIn(line)
        m.map(_.group(1)).getOrElse("")
      }
      // smin/smax are URL-encoded like paths (arbitrary user strings
      // must not break the line format); absent field ⇒ None — old
      // manifests stay readable and simply never string-prune
      def strField(k: String): Option[String] = {
        val v = field(k)
        if (v.isEmpty && !line.contains("\"" + k + "\":")) None
        else Some(decPath(v))
      }
      val dvRows = field("dvrows")
      val b = field("bytes")
      val bk = field("bucket")
      val nbk = field("nbuckets")
      val cl = field("cols")
      val kn = field("knulls")
      val sn = field("snulls")
      val ks = field("ksum")
      PartMeta(decPath(field("path")), field("rows").toLong,
        field("min").toLong, field("max").toLong, field("bloom"),
        strField("smin"), strField("smax"), field("dv"),
        decPath(field("dvref")),
        if (dvRows.isEmpty) 0L else dvRows.toLong,
        if (b.isEmpty) 0L else b.toLong,
        if (bk.isEmpty) -1 else bk.toInt,
        if (nbk.isEmpty) 0 else nbk.toInt,
        field("sorted") == "1",
        cstats = ColStat.decode(decPath(field("cstats"))),
        // the part's LINE LAYOUT as stable field ids (column mapping);
        // absent ⇒ the legacy identity rule: slot j holds field id j
        cols = if (cl.isEmpty) Seq.empty
          else cl.split('-').toSeq.map(_.toInt),
        // null counts of the key / first-string columns; -1 (absent,
        // legacy) always means "unknown — cannot prune or answer"
        kNulls = if (kn.isEmpty) -1L else kn.toLong,
        sNulls = if (sn.isEmpty) -1L else sn.toLong,
        // key-column sum; absent = untracked (legacy) or overflowed
        kSum = if (ks.isEmpty) None else Some(ks.toLong),
        // pending equality-delete clauses; absent (legacy) = none
        eq = EqClause.decode(decPath(field("eq"))),
        // nested sub-layouts (`pid:0-1-2|pid2:0-1`); absent ⇒ identity
        ncols = {
          val nc = field("ncols")
          if (nc.isEmpty) Map.empty[Int, Seq[Int]]
          else nc.split('|').map { e =>
            val Array(pid, sids) = e.split(":", 2)
            pid.toInt -> (if (sids.isEmpty) Seq.empty[Int]
              else sids.split('-').toSeq.map(_.toInt))
          }.toMap
        })
    }

  /** TABLE-LEVEL LAYOUT SPEC (`_TABLE.json`): created by `CREATE
    * TABLE … PARTITIONED BY (bucket(n, col))` / `(col)` and read by
    * every catalog load — layout policy lives with the TABLE, so
    * every INSERT INTO routes through the bucketed/split writer
    * without the writer ever being told. EVOLVABLE after create
    * (`CALL cat.system.set_layout(...)` — the Iceberg partition-spec
    * evolution shape): the replace is metadata-only, EXISTING parts
    * keep the generation they were written under (the scan demotes
    * SPJ while generations are mixed), and compaction migrates data
    * to the head spec. An optional `orderBy` field carries the
    * table's WRITE ORDERED BY column for unpartitioned layouts
    * (range-distributed, sorted parts → tight min/max pruning);
    * legacy readers regex-parse the known fields and ignore it. */
  private[sources] def writeTableSpec(conf: Configuration, dir: String,
      buckets: Int, bucketCol: String,
      orderBy: Option[String] = None,
      transform: Option[String] = None): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val tmp = new Path(d,
      s"._TABLE.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val ob = orderBy.filter(_.nonEmpty)
      .fold("")(c => s""","orderBy":"${encPath(c)}"""")
    // hidden-transform split layouts (days/hours over a TIMESTAMP
    // column) tag the spec; legacy readers regex known fields only
    val tf = transform.filter(_.nonEmpty)
      .fold("")(t => s""","transform":"${encPath(t)}"""")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"buckets":$buckets,"bucketCol":"${encPath(bucketCol)}"$ob$tf}\n"""
        .getBytes("UTF-8"))
    finally out.close()
    // replace-in-place (RENAME COLUMN of the bucket column and
    // set_layout rewrite the spec): Hadoop's local rename refuses an
    // existing target
    val target = new Path(d, "_TABLE.json")
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"table spec publish failed at $dir")
    }
  }

  /** Declared secondary-bloom columns (the `graft.bloom_cols` table
    * property, comma-separated STRING column names): each listed
    * column gets a per-part membership bloom in its [[ColStat]],
    * consulted by point lookups where min/max ranges admit nearly
    * every part (high-cardinality strings: URLs, digests, UUIDs).
    * Capped at 4 — each bloom costs up to 8 KB of manifest line per
    * part, the key bloom's budget. */
  private[sources] val BloomColsProp = "graft.bloom_cols"
  private[sources] def bloomCols(conf: Configuration,
      dir: String): Seq[String] =
    readTableProps(conf, dir).get(BloomColsProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).take(4)

  /** Optional secondary-bloom SIZE knob (`graft.bloom_bits`, bits,
    * clamped to [2^10, 2^20], default = the key bloom's 2^16 cap).
    * The filter is INLINE on the manifest line, so size is a direct
    * manifest-weight tradeoff: at 2^16 bits a part with ~12k distinct
    * values already runs ~8% false-positive (saturating toward
    * admit-all — sound, never wrong, just prunes less); tables whose
    * parts carry high-cardinality bloom columns declare a larger
    * filter knowingly (2^18 ≈ 64 KB hex per part per column). */
  private[sources] val BloomBitsProp = "graft.bloom_bits"
  private[sources] def bloomBits(conf: Configuration, dir: String): Int = {
    val v = readTableProps(conf, dir).get(BloomBitsProp)
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .getOrElse(PartBloom.MaxBits)
    val clamped = math.max(PartBloom.MinBits, math.min(1 << 20, v))
    java.lang.Integer.highestOneBit(clamped) // power of two (mask math)
  }

  /** ANALYZE-collected TABLE-LEVEL NDV per tracked column
    * (`graft.ndv` property, `urlenc(col):ndv;…`): what Spark's CBO
    * (JoinEstimation / CostBasedJoinReorder) needs to size join
    * outputs and reorder a multi-join chain — surfaced through the
    * scan's DSv2 column stats. O(1) to read at plan time;
    * stale-until-reANALYZE like every engine's catalog stats. */
  private[sources] val NdvProp = "graft.ndv"
  private[sources] def encodeNdv(pairs: Seq[(String, Long)]): String =
    pairs.map { case (c, d) =>
      s"${java.net.URLEncoder.encode(c, "UTF-8")}:$d" }.mkString(";")
  private[sources] def readNdv(conf: Configuration,
      dir: String): Map[String, Long] =
    readTableProps(conf, dir).get(NdvProp).toSeq
      .flatMap(_.split(";")).filter(_.nonEmpty).map { kv =>
        val i = kv.lastIndexOf(':')
        java.net.URLDecoder.decode(kv.substring(0, i), "UTF-8") ->
          kv.substring(i + 1).toLong
      }.toMap

  /** ANALYZE-collected EQUI-DEPTH HISTOGRAMS per tracked long column
    * (`graft.hist` property, `urlenc(col)=height:lo,hi,ndv|…;…`):
    * what Spark's FilterEstimation needs to size a RANGE predicate on
    * a SKEWED column — NDV + [min,max] assume uniformity, so a hot
    * value makes `col > hot` estimate the whole range. Surfaced
    * through the DSv2 scan's columnStats().histogram() (catalyst
    * converts it in transformV2Stats). Stale-until-reANALYZE like
    * every engine's histogram stats. */
  private[sources] val HistProp = "graft.hist"
  private[sources] def encodeHist(
      hists: Seq[(String, Double, Seq[(Long, Long, Long)])]): String =
    hists.map { case (c, height, bins) =>
      s"${java.net.URLEncoder.encode(c, "UTF-8")}=$height:" +
        bins.map { case (lo, hi, ndv) => s"$lo,$hi,$ndv" }.mkString("|")
    }.mkString(";")
  private[sources] def readHist(conf: Configuration, dir: String)
      : Map[String, (Double, Seq[(Long, Long, Long)])] =
    readTableProps(conf, dir).get(HistProp).toSeq
      .flatMap(_.split(";")).filter(_.nonEmpty).flatMap { kv =>
        scala.util.Try {
          val eq = kv.indexOf('=')
          val c = java.net.URLDecoder.decode(kv.substring(0, eq), "UTF-8")
          val rest = kv.substring(eq + 1)
          val colon = rest.indexOf(':')
          val height = rest.substring(0, colon).toDouble
          val bins = rest.substring(colon + 1).split("\\|").toSeq
            .filter(_.nonEmpty).map { b =>
              val p = b.split(",")
              (p(0).toLong, p(1).toLong, p(2).toLong)
            }
          c -> (height, bins)
        }.toOption
      }.toMap

  /** TABLE PROPERTIES (`TBLPROPERTIES` / `COMMENT ON TABLE` — the
    * Delta/Iceberg free-form key-value surface): stored in their own
    * `_PROPS.json` sidecar (URL-encoded `k:v;…` — keys and values
    * round-trip arbitrary text), replaced atomically like the layout
    * spec. Properties are TABLE-level operational metadata (comments,
    * team ownership tags, policy knobs), not snapshot state — they
    * deliberately do not version with the data. */
  private[sources] def writeTableProps(conf: Configuration, dir: String,
      props: Map[String, String]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val target = new Path(d, "_PROPS.json")
    if (props.isEmpty) { if (fs.exists(target)) fs.delete(target, false); return }
    fs.mkdirs(d)
    val tmp = new Path(d,
      s"._PROPS.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val body = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${encPath(k)}:${encPath(v)}" }.mkString(";")
    val out = fs.create(tmp, true)
    try out.write(s"""{"props":"$body"}\n""".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"table props publish failed at $dir")
    }
  }

  private[sources] def readTableProps(conf: Configuration,
      dir: String): Map[String, String] = {
    val p = new Path(dir, "_PROPS.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    """"props":"([^"]*)"""".r.findFirstMatchIn(line).map(_.group(1))
      .filter(_.nonEmpty)
      .map(_.split(';').toSeq.map { kv =>
        val Array(k, v) = kv.split(":", 2)
        decPath(k) -> decPath(v)
      }.toMap).getOrElse(Map.empty)
  }

  /** Drop the layout spec entirely (`set_layout(..., spec =>
    * 'none')`): later INSERTs take the plain unpartitioned write
    * path; existing parts keep their recorded layout. */
  private[sources] def clearTableSpec(conf: Configuration,
      dir: String): Unit = {
    val p = new Path(dir, "_TABLE.json")
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, false)
  }

  private[sources] def readTableSpec(conf: Configuration,
      dir: String): Option[(Int, String)] = {
    val p = new Path(dir, "_TABLE.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    val n = """"buckets":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
    val c = """"bucketCol":"([^"]*)"""".r.findFirstMatchIn(line)
      .map(m => decPath(m.group(1)))
    for (nn <- n; cc <- c) yield (nn, cc)
  }

  /** The split spec's hidden time transform ("days" | "hours"), when
    * the layout is `PARTITIONED BY (days(ts))` / `(hours(ts))` —
    * always paired with a (0, col) [[readTableSpec]] result. */
  private[sources] def readTableTransform(conf: Configuration,
      dir: String): Option[String] = {
    val p = new Path(dir, "_TABLE.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    """"transform":"([^"]*)"""".r.findFirstMatchIn(line)
      .map(m => decPath(m.group(1))).filter(_.nonEmpty)
  }

  /** The table's WRITE ORDERED BY column, when one is set. */
  private[sources] def readTableOrder(conf: Configuration,
      dir: String): Option[String] = {
    val p = new Path(dir, "_TABLE.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    """"orderBy":"([^"]*)"""".r.findFirstMatchIn(line)
      .map(m => decPath(m.group(1))).filter(_.nonEmpty)
  }

  /** CHECK CONSTRAINTS (`_CONSTRAINTS.json`, one URL-encoded record
    * line per constraint): stored by `ALTER TABLE ADD CONSTRAINT …
    * CHECK (…)`, reported by the loaded table's `constraints()`, and
    * from there ENFORCED BY THE ENGINE — Spark's
    * ResolveTableConstraints injects a CheckInvariant over every
    * write to the table, so a violating INSERT fails before a single
    * part commits (the write is atomic: no partial data lands). The
    * file is replaced atomically as a whole — constraint sets are
    * tiny and change rarely. */
  private[sources] def writeConstraints(conf: Configuration, dir: String,
      constraints: Seq[(String, String)]): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val target = new Path(d, "_CONSTRAINTS.json")
    if (constraints.isEmpty) { fs.delete(target, false); return }
    val tmp = new Path(d,
      s"._CONSTRAINTS.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try constraints.foreach { case (n, sql) =>
      out.write(
        s"""{"name":"${encPath(n)}","sql":"${encPath(sql)}"}\n"""
          .getBytes("UTF-8"))
    } finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"constraint publish failed at $dir")
    }
  }

  private[sources] def readConstraints(conf: Configuration,
      dir: String): Seq[(String, String)] = {
    val p = new Path(dir, "_CONSTRAINTS.json")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    lines.filter(_.nonEmpty).map { line =>
      def field(k: String): String =
        ("\"" + k + "\":\"([^\"]*)\"").r.findFirstMatchIn(line)
          .map(m => decPath(m.group(1))).getOrElse("")
      (field("name"), field("sql"))
    }
  }

  /** SNAPSHOT TAGS — immutable named refs (`_TAG.<name>.json`
    * holding the version number): `VERSION AS OF 'name'` resolves
    * through them, and expire-snapshots RETAINS tagged versions (a
    * tag is a promise the snapshot stays readable — the
    * audit/repro/release pin, Iceberg-tag semantics). Tags never
    * move; retag = drop + create. */
  private[sources] def tagFile(name: String): String = s"_TAG.$name.json"

  private[sources] def writeTag(conf: Configuration, dir: String,
      name: String, version: Int): Unit = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"invalid tag name '$name' (letters, digits, '_', '-' only)")
    require(listVersions(conf, dir).contains(version),
      s"cannot tag version $version at $dir: no such snapshot")
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val target = new Path(d, tagFile(name))
    if (fs.exists(target)) throw new IllegalStateException(
      s"tag '$name' already exists at $dir (tags are immutable; " +
        "drop it first to retag)")
    val tmp = new Path(d,
      s".${tagFile(name)}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"version":$version}\n""".getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      // the atomic rename lost to a concurrent tagger — same name,
      // fail loudly like the exists check would have
      throw new IllegalStateException(s"tag '$name' already exists at $dir")
    }
  }

  private[sources] def readTag(conf: Configuration, dir: String,
      name: String): Option[Int] = {
    val p = new Path(dir, tagFile(name))
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next() finally in.close()
    """"version":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
  }

  private[sources] def listTags(conf: Configuration,
      dir: String): Seq[(String, Int)] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_TAG.") && n.endsWith(".json"))
      .map(n => n.stripPrefix("_TAG.").stripSuffix(".json"))
      .sorted
      .flatMap(n => readTag(conf, dir, n).map(n -> _))
  }

  private[sources] def dropTag(conf: Configuration, dir: String,
      name: String): Boolean = {
    val p = new Path(dir, tagFile(name))
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.delete(p, false)
  }

  /** The committed table schema (manifest header line), if present. */
  def readSchema(conf: Configuration, dir: String): Option[StructType] =
    readSchema(conf, dir, None)

  /** Snapshot-version-aware schema read: each snapshot carries ITS OWN
    * schema header, so time travel sees the schema as of that commit
    * (additive evolution never rewrites history). */
  def readSchema(conf: Configuration, dir: String,
      version: Option[Int]): Option[StructType] =
    schemaFromLines(manifestLines(conf, dir, version))

  private def schemaFromLines(lines: Seq[String]): Option[StructType] =
    lines.find(_.startsWith("{\"schema\":"))
      .map { line =>
        val ddl = line.stripPrefix("{\"schema\":\"").stripSuffix("\"}")
          .replace("\\\"", "\"").replace("\\\\", "\\")
        StructType.fromDDL(ddl)
      }

  private val ColMapIdsRe = """"colmap":"([0-9-]*)"""".r
  private val ColMapNextRe = """"nextid":(\d+)""".r
  private val ColMapRetRe = """"retired":"([^"]*)"""".r

  /** The snapshot's [[ColMap]] header; absent (every pre-mapping
    * manifest) ⇒ identity over the snapshot schema's field count. */
  private def colMapFromLines(lines: Seq[String]): Option[ColMap] =
    lines.find(_.startsWith("{\"colmap\":")).map { line =>
      val ids = ColMapIdsRe.findFirstMatchIn(line).map(_.group(1))
        .filter(_.nonEmpty).map(_.split('-').toSeq.map(_.toInt))
        .getOrElse(Seq.empty)
      val next = ColMapNextRe.findFirstMatchIn(line).map(_.group(1).toInt)
        .getOrElse(if (ids.isEmpty) 0 else ids.max + 1)
      val retired = ColMapRetRe.findFirstMatchIn(line).map(_.group(1))
        .filter(_.nonEmpty)
        .map(_.split(',').toSeq.map(decPath)).getOrElse(Seq.empty)
      val defaults = """"defaults":"([^"]*)"""".r.findFirstMatchIn(line)
        .map(_.group(1)).filter(_.nonEmpty).map(_.split(';').toSeq.map {
          entry =>
            val Array(id, cur, ex) = entry.split(":", 3)
            id.toInt -> (decPath(cur), decPath(ex))
        }.toMap).getOrElse(Map.empty[Int, (String, String)])
      // nested field ids (additive field, see renderColMap):
      // `pid=id0-id1~next~ret0/ret1|...`
      val nested = """"nestedmap":"([^"]*)"""".r.findFirstMatchIn(line)
        .map(_.group(1)).filter(_.nonEmpty).map(_.split('|').toSeq.map {
          entry =>
            val Array(pid, body) = entry.split("=", 2)
            val Array(nids, nnext, nret) = body.split("~", 3)
            pid.toInt -> ColMap.Nested(
              if (nids.isEmpty) Seq.empty
              else nids.split('-').toSeq.map(_.toInt),
              nnext.toInt,
              if (nret.isEmpty) Seq.empty
              else nret.split('/').toSeq.map(decPath))
        }.toMap).getOrElse(Map.empty[Int, ColMap.Nested])
      ColMap(ids, next, retired, defaults, nested)
    }

  /** Snapshot schema + column mapping, read from ONE manifest
    * resolution (the pair is only consistent when both come from the
    * same lines). */
  private[sources] def readSchemaAndColMap(conf: Configuration,
      dir: String, version: Option[Int] = None,
      branch: Option[String] = None): Option[(StructType, ColMap)] = {
    val lines = manifestLines(conf, dir, version, branch)
    schemaFromLines(lines).map { s =>
      (s, colMapFromLines(lines).getOrElse(ColMap.identity(s.fields.length)))
    }
  }

  private def renderColMap(cm: ColMap): String = {
    // defaults are an ADDITIVE field (legacy readers regex the known
    // fields and ignore it): `id:enc(cur):enc(exists);...`
    val dflt = if (cm.defaults.isEmpty) ""
      else s""","defaults":"${cm.defaults.toSeq.sortBy(_._1)
        .map { case (id, (cur, ex)) =>
          s"$id:${encPath(cur)}:${encPath(ex)}" }.mkString(";")}""""
    // nested mappings, additive like defaults (legacy readers ignore
    // the field): structural chars are never produced by encPath
    val nst = if (cm.nested.isEmpty) ""
      else s""","nestedmap":"${cm.nested.toSeq.sortBy(_._1)
        .map { case (pid, n) =>
          s"$pid=${n.ids.mkString("-")}~${n.nextId}~" +
            n.retired.map(encPath).mkString("/") }.mkString("|")}""""
    s"""{"colmap":"${cm.ids.mkString("-")}","nextid":${cm.nextId},""" +
      s""""retired":"${cm.retired.map(encPath).mkString(",")}"$dflt$nst}"""
  }

  /** The mapping the published snapshot carries: an explicit override
    * (DDL — rename/drop/add know their exact result), or derivation
    * from the head by NAME — a field the head already maps keeps its
    * id; a new field (additive append evolution) allocates the next
    * one. The identity default means tables that never rename or drop
    * never even materialize a header. */
  private def deriveColMap(headSchemaCm: Option[(StructType, ColMap)],
      published: StructType): ColMap = headSchemaCm match {
    case None => ColMap.identity(published.fields.length)
    case Some((hs, hcm)) =>
      val byName = hs.fields.map(_.name).zip(hcm.ids).toMap
      var next = hcm.nextId
      val ids = published.fields.map { f =>
        byName.getOrElse(f.name, { val id = next; next += 1; id })
      }.toSeq
      // defaults follow their field id; a dropped field's entry goes
      // (nested mappings follow their PARENT's id the same way)
      ColMap(ids, next, hcm.retired,
        hcm.defaults.filter { case (id, _) => ids.contains(id) },
        hcm.nested.filter { case (pid, _) => ids.contains(pid) })
  }

  /** Publish a snapshot whose part list is exactly `parts` (commit
    * path for writes, and the metadata-only path for DDL/DELETE: a
    * new version is one small JSON file — no data is copied). Atomic:
    * content lands under a temp name and renames in; the immutable
    * snapshot publishes before the head pointer flips, so a crash
    * between the two leaves the table readable at the old head with a
    * complete (merely unreferenced) new snapshot. Returns the
    * committed version (0 for a plain non-history table). */
  private[sources] def publishSnapshot(conf: Configuration, path: String,
      schema: StructType, parts: Seq[PartMeta], history: Boolean,
      colmap: Option[ColMap] = None, op: String = ""): Int =
    // fixed-part publishes (staging reads, restore, fast-forward,
    // clone, truncate) re-reference EXISTING parts: their recorded
    // layouts are already correct, so never stamp — and when the
    // caller hands the snapshot's mapping, publish it verbatim
    publishRebase(conf, path, schema, history, _ => parts,
      strictBase = None, colmapOverride = colmap, stampNew = false,
      op = op)

  /** The table's [[ColMap]] aligned BY NAME to `schema` (None when
    * trivially identity) — what a temp staging manifest over a mapped
    * table's parts must carry so mixed-generation layouts decode
    * correctly through the staging read. */
  private[sources] def alignedColMap(conf: Configuration, dir: String,
      schema: StructType, version: Option[Int] = None,
      branch: Option[String] = None): Option[ColMap] =
    readSchemaAndColMap(conf, dir, version, branch).collect {
      case (snap, cm) if !cm.isPlain || cm.retired.nonEmpty =>
        val byName = snap.fields.map(_.name).zip(cm.ids).toMap
        ColMap(schema.fields.toSeq.map(f => byName.getOrElse(f.name,
          throw new IllegalStateException(
            s"column '${f.name}' has no field id at $dir"))),
          cm.nextId, cm.retired, cm.defaults, cm.nested)
    }

  /** The commit loop proper. `rebase` maps the CURRENT head's part
    * list to the list to publish, and is re-applied on EVERY claim
    * attempt against a freshly-read head — the Iceberg
    * refresh-and-reapply loop. This is what makes a racing append
    * safe: a committer that lands between our base-snapshot read and
    * our claim advances the head, our claim of its slot fails, and
    * the next attempt recomputes the part list ON TOP OF the winner's
    * snapshot instead of re-rendering a stale capture (which would
    * silently drop the winner's parts — the classic lost update).
    *
    * `strictBase = Some(v)`: the operation was planned against
    * snapshot v and CANNOT be mechanically re-applied (e.g. a
    * copy-on-write rewrite whose part classification is baked into
    * already-written files) — fail loudly if the head is no longer v
    * rather than publish a half-stale snapshot.
    *
    * `footprint = Some(paths)` RELAXES strictBase to snapshot-
    * isolation conflict detection (the Delta/Iceberg commit-conflict
    * loop): when the head has advanced past the base, the commit may
    * still proceed IF every part the operation read-and-modified is
    * provably untouched — listed in the new head with bit-identical
    * metadata (same stats, same deletion vector). The rebase then
    * re-applies against the advanced head, carrying the interleaved
    * commits' parts forward; a footprint part that was dropped,
    * rewritten, or re-vectored by the interleaved commit conflicts
    * loudly. Disjoint concurrent DML composes; overlapping DML fails
    * exactly one side. (Appends that add rows MATCHING the
    * operation's predicate are NOT conflicts — those rows were not in
    * the operation's snapshot: snapshot isolation, not
    * serializability, same as the lakehouse defaults.) */
  private[sources] def publishRebase(conf: Configuration, path: String,
      schema: StructType, history: Boolean,
      rebase: Seq[PartMeta] => Seq[PartMeta],
      strictBase: Option[Int],
      footprint: Option[Set[String]] = None,
      branch: Option[String] = None,
      colmapOverride: Option[ColMap] = None,
      stampNew: Boolean = true,
      op: String = "",
      strictForkBase: Option[Int] = None): Int = {
    branch.foreach { b =>
      require(history, s"branch commits require a history table ($path)")
      require(validBranch(b), s"invalid branch name '$b' " +
        "(letters, digits, '_', '-' only)")
    }
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    // strip default-value field metadata before rendering: the catalog
    // re-attaches CURRENT_DEFAULT/EXISTS_DEFAULT on loadTable (Spark's
    // default resolution reads it), and Spark 4's toDDL renders that
    // metadata as a `DEFAULT v` clause that fromDDL cannot parse back.
    // The colmap header is the canonical default store; the schema
    // header stays plain name+type(+comment).
    val ddlSchema = StructType(schema.fields.map { f =>
      if (f.metadata.contains("CURRENT_DEFAULT") ||
          f.metadata.contains("EXISTS_DEFAULT")) {
        val b = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        b.remove("CURRENT_DEFAULT")
        b.remove("EXISTS_DEFAULT")
        f.copy(metadata = b.build())
      } else f
    })
    val ddl = ddlSchema.toDDL.replace("\\", "\\\\").replace("\"", "\\\"")
    def render(version: Int, parts: Seq[PartMeta], cm: ColMap,
        fork: Option[Int] = None): Array[Byte] = {
      val content = new StringBuilder
      content.append(s"""{"schema":"$ddl"}""").append('\n')
      // written only once non-trivial, so a table that never renames
      // or drops keeps its manifests byte-compatible with pre-mapping
      // readers of this format
      if (!cm.isIdentity || cm.retired.nonEmpty ||
          cm.nextId != schema.fields.length || cm.defaults.nonEmpty ||
          cm.nested.nonEmpty)
        content.append(renderColMap(cm)).append('\n')
      if (history) {
        // the OPERATION KIND rides the version record (Delta's
        // DESCRIBE HISTORY `operation` / Iceberg's snapshot summary):
        // pure lineage metadata, parsed by `.history` only
        val opField = if (op.isEmpty) "" else s""","op":"${encPath(op)}""""
        // a branch's FIRST commit records the MAIN version it forked
        // from: the implicit fork would otherwise be reconstructible
        // only by containment search, which cannot distinguish a
        // genuine fork-from-empty from a branch commit that rewrote
        // every fork part (both are "contained" in an empty main
        // snapshot vacuously) — see ManifestMaintenance.cherrypick
        val forkField = fork.fold("")(f => s""","fork":$f""")
        content.append(s"""{"version":$version$opField$forkField}""")
          .append('\n')
      }
      parts.foreach { m =>
        val b = if (m.bloomHex.isEmpty) "" else s""","bloom":"${m.bloomHex}""""
        val s = (m.sMin, m.sMax) match {
          case (Some(mn), Some(mx)) =>
            s""","smin":"${encPath(mn)}","smax":"${encPath(mx)}""""
          case _ => ""
        }
        val d = if (m.dvHex.isEmpty) "" else s""","dv":"${m.dvHex}""""
        val r = if (m.dvRef.isEmpty) ""
          else s""","dvref":"${encPath(m.dvRef)}","dvrows":${m.dvCard}"""
        val by = if (m.bytes <= 0) "" else s""","bytes":${m.bytes}"""
        val bk = if (m.nbuckets <= 0) ""
          else s""","bucket":${m.bucket},"nbuckets":${m.nbuckets}"""
        val so = if (!m.sorted) "" else s""","sorted":1"""
        val cs = if (m.cstats.isEmpty) ""
          else s""","cstats":"${encPath(ColStat.encode(m.cstats))}""""
        val co = if (m.cols.isEmpty) ""
          else s""","cols":"${m.cols.mkString("-")}""""
        val nc = if (m.ncols.isEmpty) ""
          else s""","ncols":"${m.ncols.toSeq.sortBy(_._1).map {
            case (pid, sids) => s"$pid:${sids.mkString("-")}"
          }.mkString("|")}""""
        val kn = if (m.kNulls < 0) "" else s""","knulls":${m.kNulls}"""
        val sn = if (m.sNulls < 0) "" else s""","snulls":${m.sNulls}"""
        val ks = m.kSum.fold("")(v => s""","ksum":$v""")
        val ef = if (m.eq.isEmpty) ""
          else s""","eq":"${encPath(EqClause.encode(m.eq))}""""
        content.append(
          s"""{"path":"${encPath(m.path)}","rows":${m.rows},""" +
            s""""min":${m.kMin},"max":${m.kMax}$b$s$d$r$by$bk$so$cs$co$nc$kn$sn$ks$ef}""")
          .append('\n')
      }
      content.toString.getBytes("UTF-8")
    }
    def write(name: String, bytes: Array[Byte], overwrite: Boolean): Boolean = {
      val target = new Path(dir, name)
      val tmp = new Path(dir, s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      if (!overwrite && fs.exists(target)) { fs.delete(tmp, false); return false }
      if (overwrite && fs.exists(target)) fs.delete(target, false)
      if (!fs.rename(tmp, target)) { fs.delete(tmp, false); false } else true
    }
    // column mapping bookkeeping shared by both commit paths: resolve
    // the mapping (override from DDL, else derive from the head), and
    // stamp every NEWLY-ADDED part with its line layout (the published
    // schema's field ids) — but only once the mapping is non-identity;
    // under identity the absent-cols legacy rule IS the layout
    def finish(head: Seq[PartMeta],
        headSchemaCm: Option[(StructType, ColMap)],
        parts: Seq[PartMeta]): (Seq[PartMeta], ColMap) = {
      val cm = colmapOverride.getOrElse(deriveColMap(headSchemaCm, schema))
      if ((cm.isIdentity && cm.nested.isEmpty) || !stampNew) (parts, cm)
      else {
        val headPaths = head.map(_.path).toSet
        val nestedLayout = cm.nested.map { case (pid, n) => pid -> n.ids }
        (parts.map { p =>
          if (headPaths(p.path)) p
          else {
            var q = p
            if (!cm.isIdentity && q.cols.isEmpty) q = q.copy(cols = cm.ids)
            if (cm.nested.nonEmpty && q.ncols.isEmpty)
              q = q.copy(ncols = nestedLayout)
            q
          }
        }, cm)
      }
    }
    if (!history) {
      // a plain table has no version log to pin against — silently
      // ignoring strictBase would void the caller's race guarantee
      require(strictBase.isEmpty,
        s"strictBase requires a history table, got plain table at $dir")
      val head = readManifestMeta(conf, path, None)
      val (parts, cm) =
        finish(head, readSchemaAndColMap(conf, path), rebase(head))
      if (!write(ManifestFile, render(0, parts, cm), overwrite = true))
        throw new java.io.IOException(s"cannot publish $dir/$ManifestFile")
      return 0
    }
    // OPTIMISTIC CONCURRENCY (the Iceberg commit loop): a history
    // commit CLAIMS its immutable version file — exists-check + rename,
    // never an overwrite — so two racing committers cannot both land
    // on version N and silently drop a snapshot; the loser re-reads
    // the log, RE-APPLIES its operation against the new head via
    // `rebase`, and retries at the next free slot. (On HDFS the rename
    // itself refuses an existing destination, making the claim fully
    // atomic; on a raw local fs the exists-check shrinks the window.)
    // The unversioned head file is a convenience POINTER, rewritten
    // after the claim — readers of history tables resolve HEAD from
    // the newest version file (see manifestLines), so a stale or
    // raced head pointer can never serve a dropped/old snapshot.
    var attempts = 0
    var committed = -1
    var finalParts: Seq[PartMeta] = Seq.empty
    var finalColMap: ColMap = ColMap.identity(schema.fields.length)
    while (committed < 0) {
      attempts += 1
      if (attempts > 1000) throw new java.io.IOException(
        s"cannot claim a snapshot version at $dir after $attempts attempts")
      val latest = branch match {
        case Some(b) => listBranchVersions(conf, path, b).lastOption.getOrElse(0)
        case None    => listVersions(conf, path).lastOption.getOrElse(0)
      }
      // a branch with no commits forks IMPLICITLY from the main head
      val head = branch match {
        case Some(b) =>
          if (latest == 0) readManifestMeta(conf, path, None)
          else readBranchMeta(conf, path, b, Some(latest))
        case None =>
          if (latest == 0) readManifestMeta(conf, path, None)
          else readManifestMeta(conf, path, Some(latest))
      }
      strictBase.foreach { base =>
        if (latest != base) footprint match {
          case None => throw new java.util.ConcurrentModificationException(
            s"table $dir advanced from snapshot $base to $latest during an " +
              "operation that cannot be re-applied; re-plan against the new head")
          case Some(touched) =>
            // conflict check: every touched part must survive into the
            // advanced head BIT-IDENTICAL to the base snapshot's record
            def metaAt(v: Int): Seq[PartMeta] = branch match {
              case Some(b) if v > 0 => readBranchMeta(conf, path, b, Some(v))
              case _ =>
                if (v == 0) readManifestMeta(conf, path, None)
                else readManifestMeta(conf, path, Some(v))
            }
            val baseParts = metaAt(base).map(m => m.path -> m).toMap
            val headParts = head.map(m => m.path -> m).toMap
            val conflicted = touched.filter(p =>
              !headParts.get(p).exists(baseParts.get(p).contains(_)))
            if (conflicted.nonEmpty)
              throw new java.util.ConcurrentModificationException(
                s"table $dir advanced from snapshot $base to $latest and a " +
                  s"concurrent commit touched ${conflicted.size} part(s) this " +
                  s"operation read-and-modified (${conflicted.take(3).mkString(", ")}" +
                  s"${if (conflicted.size > 3) ", …" else ""}); re-plan " +
                  "against the new head")
        }
      }
      // head schema + mapping from the SAME resolved version (version
      // files are immutable once claimed, so the re-read is consistent)
      val headSchemaCm = branch match {
        case Some(b) if latest > 0 =>
          readSchemaAndColMap(conf, path, Some(latest), Some(b))
        case _ =>
          readSchemaAndColMap(conf, path,
            if (latest == 0) None else Some(latest))
      }
      val (parts, cm) = finish(head, headSchemaCm, rebase(head))
      val version = latest + 1
      val fork: Option[Int] =
        if (branch.isDefined && latest == 0)
          Some(listVersions(conf, path).lastOption.getOrElse(0))
        else None
      // fork-base pin (first-branch-commit shape): the caller derived
      // state from MAIN at `strictForkBase`; a concurrent main commit
      // moves the base this branch commit rebases onto without moving
      // the (still-empty) branch line that strictBase watches
      strictForkBase.foreach { fb =>
        fork.foreach { f =>
          if (f != fb) throw new java.util.ConcurrentModificationException(
            s"main at $dir advanced from snapshot $fb to $f while staging " +
              "the branch's first commit; re-plan against the new fork base")
        }
      }
      val claim = branch.map(branchVersionFile(_, version))
        .getOrElse(versionFile(version))
      if (write(claim, render(version, parts, cm, fork), overwrite = false)) {
        committed = version
        finalParts = parts
        finalColMap = cm
      }
    }
    // the rewritable head POINTER tracks only the MAIN line; branch
    // heads resolve purely from their newest version file
    if (branch.isEmpty)
      write(ManifestFile, render(committed, finalParts, finalColMap),
        overwrite = true)
    committed
  }

  /** Committed snapshot versions present at `dir`, ascending (history
    * mode; empty for a plain single-manifest table). */
  def listVersions(conf: Configuration, dir: String): Seq[Int] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName).collect {
      case VersionRe(v) => v.toInt
    }.sorted
  }

  /** Committed versions of a named BRANCH at `dir`, ascending. */
  def listBranchVersions(conf: Configuration, dir: String,
      branch: String): Seq[Int] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName).collect {
      case BranchVersionRe(b, v) if b == branch => v.toInt
    }.sorted
  }

  /** All branch names with at least one committed snapshot at `dir`. */
  def listBranches(conf: Configuration, dir: String): Seq[String] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq.map(_.getPath.getName).collect {
      case BranchVersionRe(b, _) => b
    }.distinct.sorted
  }

  /** DRIVER-SIDE SNAPSHOT CACHE. Version manifests are claimed
    * exclusively at commit and never rewritten, so (dir, version
    * file) → lines is safe to cache for the life of the process; at
    * 100k parts a manifest is ~10 MB of JSON, and planning reads it
    * on every scan build, every streaming trigger, and every CDF
    * version diff — the cache turns all but the first into memory
    * hits. A cheap existence probe guards each hit so an EXPIRED
    * snapshot (ManifestMaintenance deletes its file) still fails
    * loudly instead of serving from memory. Byte-bounded LRU; the
    * mutable head pointer (`_MANIFEST.json`, plain tables) is never
    * cached. */
  private object LinesCache {
    private val MaxBytes = 64L << 20
    private val map =
      new java.util.LinkedHashMap[String, Seq[String]](64, 0.75f, true)
    private var bytes = 0L
    private def sizeOf(ls: Seq[String]): Long =
      ls.foldLeft(0L)(_ + _.length + 16)
    def get(k: String): Seq[String] = synchronized { map.get(k) }
    def put(k: String, v: Seq[String]): Unit = synchronized {
      if (!map.containsKey(k)) {
        bytes += sizeOf(v)
        map.put(k, v)
        val it = map.entrySet().iterator()
        while (bytes > MaxBytes && it.hasNext) {
          val e = it.next()
          if (e.getKey != k) { bytes -= sizeOf(e.getValue); it.remove() }
        }
      }
    }
  }

  private def manifestLines(conf: Configuration, dir: String,
      version: Option[Int] = None,
      branch: Option[String] = None): Seq[String] = {
    // HEAD of a history table = the NEWEST immutable version file,
    // not the rewritable head pointer: version files are claimed
    // exclusively at commit (publishSnapshot), so this resolution is
    // immune to head-pointer races and to a committer crashing
    // between the claim and the pointer rewrite. The unversioned
    // _MANIFEST.json remains authoritative only for plain
    // (non-history) tables, where it is the sole commit point.
    // A BRANCH head is the newest branch version file; a branch with
    // no commits yet has not diverged and reads as the main head.
    val name: Option[String] = branch match {
      case Some(b) =>
        val bv = version.orElse(listBranchVersions(conf, dir, b).lastOption)
        bv match {
          case Some(v) => Some(branchVersionFile(b, v))
          case None    => listVersions(conf, dir).lastOption.map(versionFile)
        }
      case None =>
        version.orElse(listVersions(conf, dir).lastOption).map(versionFile)
    }
    val p = new Path(dir, name.getOrElse(ManifestFile))
    val fs = p.getFileSystem(conf)
    // the status probe doubles as the staleness guard: the cache key
    // carries (length, mtime), so a table dir that was DELETED AND
    // REBUILT at the same path (test/bench fixtures) misses instead
    // of serving lines that reference reclaimed part files, and an
    // EXPIRED snapshot (file gone) still fails loudly below
    val status = try fs.getFileStatus(p) catch {
      case _: java.io.FileNotFoundException => null
    }
    if (status == null) {
      if (version.isDefined) throw new IllegalArgumentException(
        s"no snapshot ${version.get}${branch.map(b => s" on branch $b")
          .getOrElse("")} at $dir (committed versions: " +
          s"${branch.map(listBranchVersions(conf, dir, _))
            .getOrElse(listVersions(conf, dir)).mkString(",")})")
      return Seq.empty
    }
    val cacheKey = name.map(n =>
      s"$dir/$n#${status.getLen}#${status.getModificationTime}").orNull
    if (cacheKey != null) {
      val hit = LinesCache.get(cacheKey)
      if (hit != null) return hit
    }
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    if (cacheKey != null) LinesCache.put(cacheKey, lines)
    lines
  }

  /** Branch-head reads (write-audit-publish): the branch's part list
    * and schema — main-head fallback while the branch has no commits. */
  def readBranchMeta(conf: Configuration, dir: String,
      branch: String, version: Option[Int] = None): Seq[PartMeta] =
    metaFromLines(manifestLines(conf, dir, version, Some(branch)))

  def readBranchSchema(conf: Configuration, dir: String,
      branch: String): Option[StructType] =
    schemaFromLines(manifestLines(conf, dir, None, Some(branch)))
}

private[sources] class ManifestTable(
    path: String, schema: StructType, history: Boolean,
    clusterBy: Option[String] = None, writePartitions: Option[Int] = None,
    branch: Option[String] = None, buckets: Option[Int] = None,
    splitBy: Option[String] = None,
    splitTransform: Option[String] = None)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "option 'path' is required")
  require(Seq(buckets, clusterBy, splitBy).count(_.isDefined) <= 1,
    "options 'buckets', 'clusterBy' and 'splitBy' are mutually " +
      "exclusive (hash-bucketed vs range-clustered vs " +
      "identity-partitioned layout)")
  require(splitTransform.isEmpty || splitBy.isDefined,
    "option 'splitTransform' requires 'splitBy' (the TIMESTAMP column " +
      "the days/hours transform derives from)")
  splitTransform.foreach(t => require(TimeSplit.valid(t),
    s"option 'splitTransform' must be 'days' or 'hours', got '$t'"))
  splitBy.foreach { c =>
    if (splitTransform.isDefined)
      require(schema.fields.exists(f => f.name == c &&
        f.dataType == org.apache.spark.sql.types.TimestampType),
        s"splitBy column '$c' with a time transform must be a " +
          s"TIMESTAMP column of the write schema " +
          schema.fieldNames.mkString("(", ",", ")"))
    else require(schema.fields.exists(f => f.name == c &&
      (f.dataType == LongType ||
        f.dataType == org.apache.spark.sql.types.StringType)),
      s"splitBy column '$c' must be a BIGINT or STRING column of the " +
        s"write schema ${schema.fieldNames.mkString("(", ",", ")")}")
  }
  buckets.foreach { n =>
    require(n >= 1, s"option 'buckets' must be >= 1, got $n")
    require(schema.fields.exists(_.dataType == LongType),
      "bucketed writes need a BIGINT key column (buckets hash the " +
        "first BIGINT column — the same column the stats prune on)")
  }
  override def name(): String = s"manifest($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = clusterBy match {
        // time-transform split via the PATH spelling: the sink cannot
        // demand a days()/hours() clustered distribution (transform
        // resolution needs a function catalog; a bare path has none),
        // so the write takes the caller's partitioning as-is — every
        // part is still single-ordinal (the writer splits by the
        // derived value), just possibly more parts per ordinal. The
        // CATALOG spelling plans the proper one-exchange layout;
        // compaction re-clusters by the ordinal when it migrates.
        case None if splitBy.isDefined && splitTransform.isDefined =>
          new Write {
            override def toBatch: BatchWrite =
              new ManifestBatchWrite(path, info.schema(), doTruncate,
                history,
                new SerializableConfiguration(ManifestSink.driverConf()),
                branch, splitBy = splitBy, splitTransform = splitTransform)
          }
        case None if splitBy.isDefined =>
          // IDENTITY-PARTITIONED WRITE (`option("splitBy", c)`): the
          // sink demands a CLUSTERED distribution on the column —
          // Spark shuffles each distinct value to exactly one write
          // task — and the task writer then opens one part file per
          // value it sees, so EVERY COMMITTED PART IS SINGLE-VALUED
          // on the column (min==max per-part stats). That layout is
          // what turns `GROUP BY c` into a metadata-only pushed
          // aggregate and makes `c = v` predicates prune to exactly
          // the value's parts — the Hive/Iceberg identity-partition
          // shape, carried by stats instead of directory names.
          import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
          import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
          val col = splitBy.get
          require(info.schema().fieldNames.contains(col),
            s"splitBy column '$col' not in write schema " +
              info.schema().fieldNames.mkString("(", ",", ")"))
          new Write with RequiresDistributionAndOrdering {
            override def requiredDistribution(): Distribution =
              Distributions.clustered(Array(Expressions.identity(col)))
            override def requiredOrdering(): Array[SortOrder] =
              Array.empty
            override def requiredNumPartitions(): Int =
              writePartitions.getOrElse(0)
            override def toBatch: BatchWrite =
              new ManifestBatchWrite(path, info.schema(), doTruncate, history,
                new SerializableConfiguration(ManifestSink.driverConf()),
                branch, splitBy = splitBy, splitTransform = splitTransform)
          }
        case None => new Write {
          override def toBatch: BatchWrite =
            // capture the session conf HERE — newWriteBuilder/build run
            // on the driver; executors only ever see the serialized copy
            new ManifestBatchWrite(path, info.schema(), doTruncate, history,
              new SerializableConfiguration(ManifestSink.driverConf()), branch,
              buckets)
        }
        case Some(col) =>
          // DECLARATIVE CLUSTERED WRITE (`option("clusterBy", "k")`
          // [+ `writePartitions`]): the SINK demands a globally
          // SORTED distribution on the key, so Spark plans the range
          // exchange + sort and every committed part owns a disjoint
          // key range — the stats-prunable layout — without the
          // caller hand-rolling repartitionByRange. This is the
          // RequiresDistributionAndOrdering contract Iceberg uses for
          // its write.distribution-mode=range: layout policy lives
          // with the TABLE, not with every writer. At 100 TB the
          // ordered exchange is one extra shuffle at ingest that buys
          // every later keyed read its part pruning.
          import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
          import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
          require(info.schema().fieldNames.contains(col),
            s"clusterBy column '$col' not in write schema " +
              info.schema().fieldNames.mkString("(", ",", ")"))
          val order = Array[SortOrder](
            Expressions.sort(Expressions.column(col), SortDirection.ASCENDING))
          new Write with RequiresDistributionAndOrdering {
            override def requiredDistribution(): Distribution =
              Distributions.ordered(order)
            override def requiredOrdering(): Array[SortOrder] = order
            override def requiredNumPartitions(): Int =
              writePartitions.getOrElse(0) // 0 = planner's choice
            override def toBatch: BatchWrite =
              new ManifestBatchWrite(path, info.schema(), doTruncate, history,
                new SerializableConfiguration(ManifestSink.driverConf()), branch)
          }
      }
    }
}

/** Driver-side commit coordinator.
  *
  * Two commit layouts share one protocol:
  *
  *  - plain (default): a single `_MANIFEST.json`, last-writer-wins;
  *    `overwrite` physically truncates the directory — exactly the
  *    original sink contract.
  *  - `history=true`: every commit additionally publishes an IMMUTABLE
  *    `_MANIFEST.v<N>.json` snapshot (N = 1 + latest committed
  *    version) and rewrites the head as a copy of it. `overwrite`
  *    becomes a LOGICAL truncate — the new snapshot just lists no
  *    prior parts; superseded part files stay on disk, readable via
  *    `option("version", n)` until [[ManifestMaintenance.expireSnapshots]]
  *    reclaims them. This is the Iceberg/Delta snapshot-log shape:
  *    time travel costs one small JSON file per commit, never a data
  *    copy.
  *
  * `append` (SaveMode.Append — no truncate) carries the current head's
  * part list into the new snapshot, so a commit is O(new data); the
  * incoming schema must extend the committed one additively (equal, or
  * adding trailing columns — old parts then decode the missing
  * trailing columns as NULL; see [[ManifestCodec]]).
  *
  * Part files are staged as `part-<commitToken>-<partition>-<task>`:
  * the per-commit token (chosen once on the driver) makes part names
  * unique ACROSS commits, so an appended or retained snapshot can
  * never have a later commit silently overwrite its data files — the
  * invariant snapshot isolation rests on. */
private[sources] class ManifestBatchWrite(
    path: String, schema: StructType, truncate: Boolean, history: Boolean,
    conf: SerializableConfiguration, branch: Option[String] = None,
    buckets: Option[Int] = None,
    replaceFilters: Option[Array[org.apache.spark.sql.sources.Filter]] = None,
    opLabel: Option[String] = None,
    splitBy: Option[String] = None,
    splitTransform: Option[String] = None,
    identity: Option[ManifestIdentity.Spec] = None,
    generated: Seq[(Int, org.apache.spark.sql.catalyst.expressions.Expression)] =
      Seq.empty)
    extends BatchWrite {

  // last line of defense for the path-based write spelling (no
  // catalog in front of it): reject codec-unrepresentable schemas
  // before any part is staged
  ManifestSink.validateStructDepth(schema)

  private def opName: String = opLabel.getOrElse(
    if (replaceFilters.isDefined) "replace-where"
    else if (truncate) "overwrite" else "append")

  private val token = java.util.UUID.randomUUID().toString.take(8)

  /** Identity-table appends derive the id high-water mark from the
    * committed head ONCE, in createBatchWriterFactory — so the commit
    * must pin that exact base: publishRebase's optimistic merge would
    * otherwise happily interleave two concurrent identity appends that
    * both derived the same mark and issued OVERLAPPING ids, silently
    * breaking the uniqueness contract IdentitySpec pins. Set when the
    * factory resolves the mark (history tables only — identity lives
    * on catalog tables, which are always history). */
  @volatile private var identityBaseVersion: Option[Int] = None

  /** For a branch's FIRST identity append (empty branch log) the id
    * mark is derived from MAIN's head — strictBase = Some(0) only
    * pins the branch line, so a concurrent MAIN commit between plan
    * and commit would advance the fork base (which the branch commit
    * rebases onto) without tripping the check, landing overlapping
    * ids. Record the main version the mark came from and have the
    * commit loop verify the fork base is unchanged. */
  @volatile private var identityForkBase: Option[Int] = None

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    // prepare the target dir on the DRIVER before tasks launch; with
    // history, truncate is logical (snapshots own their part files)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && !history && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val factory0 =
      new ManifestWriterFactory(path, schema, token, conf, buckets, splitBy,
        splitTransform)
    // generated wraps INNER (sees identity-filled rows were it to
    // reference them — banned at create, so order only matters for
    // the refusal messages); identity wraps OUTER so its fill sees
    // the raw incoming row
    val factory =
      if (generated.isEmpty) factory0
      else GeneratedFillFactory(factory0, schema, generated)
    identity match {
      case Some(spec) =>
        val slot = schema.fields.indexWhere(f =>
          ManifestGenerated.sameName(f.name, spec.col))
        // an append that omits the identity column entirely (schema
        // prefix without it) has nothing to fill — the reader serves
        // NULL for the missing slot, which the gate below refuses
        require(slot >= 0, s"identity column '${spec.col}' missing " +
          s"from the write schema ${schema.simpleString} — select it " +
          "as NULL (or a value, under GENERATED BY DEFAULT)")
        // high-water is DERIVED from committed stats at plan time —
        // head parts even under logical truncate, so ids never reuse
        // across a time-travelable overwrite. Resolve the version
        // FIRST and read the head AT that version (version files are
        // immutable once claimed): the commit pins this base, so a
        // concurrent commit between here and our commit fails loudly
        // instead of landing overlapping ids.
        val latestV = if (!history) 0 else branch match {
          case Some(b) =>
            ManifestSink.listBranchVersions(conf.value, path, b)
              .lastOption.getOrElse(0)
          case None =>
            ManifestSink.listVersions(conf.value, path)
              .lastOption.getOrElse(0)
        }
        if (history) identityBaseVersion = Some(latestV)
        val head = branch match {
          case Some(b) =>
            if (latestV == 0) {
              // empty branch log: the mark derives from MAIN. Resolve
              // the main version FIRST and read AT it (version files
              // are immutable) so the recorded fork base and the head
              // the mark was derived from are the same snapshot.
              val mainV = ManifestSink.listVersions(conf.value, path)
                .lastOption.getOrElse(0)
              identityForkBase = Some(mainV)
              ManifestSink.readManifestMeta(conf.value, path,
                if (mainV == 0) None else Some(mainV))
            }
            else ManifestSink.readBranchMeta(conf.value, path, b, Some(latestV))
          case None =>
            ManifestSink.readManifestMeta(conf.value, path,
              if (latestV == 0) None else Some(latestV))
        }
        IdentityFillFactory(factory, schema, slot, spec.step,
          spec.allowExplicit,
          ManifestIdentity.nextBase(head, schema, spec))
      case None => factory
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // append: check the schema only evolved additively (name+type
    // prefix match) before carrying the head's parts forward — for a
    // branch commit, against the BRANCH head's schema
    val committed = if (truncate) None else branch
      .map(b => ManifestSink.readBranchSchema(conf.value, path, b))
      .getOrElse(ManifestSink.readSchema(conf.value, path))
    committed.foreach { old =>
      // struct columns compare nullability-INSENSITIVELY one level
      // down: an INSERT of named_struct literals arrives with every
      // sub-field NOT NULL, but the committed struct's sub-nullability
      // is the table's (and sticky — see `published` below)
      def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
        case (x: StructType, y: StructType) =>
          x.fields.length == y.fields.length &&
            x.fields.zip(y.fields).forall { case (fa, fb) =>
              fa.name == fb.name && sameType(fa.dataType, fb.dataType)
            }
        case _ => a == b
      }
      val prefixOk = old.fields.length <= schema.fields.length &&
        old.fields.zip(schema.fields).forall { case (a, b) =>
          a.name == b.name && sameType(a.dataType, b.dataType)
        }
      if (!prefixOk) throw new IllegalArgumentException(
        s"append schema must extend the committed schema additively; " +
          s"committed=${old.toDDL} incoming=${schema.toDDL}")
    }
    // The published schema must never let a WRITE's tighter nullability
    // stomp the table's: an INSERT of literals arrives with every field
    // NOT NULL, but (a) nullability is STICKY — rows committed under a
    // nullable column may hold nulls forever — and (b) a column the
    // committed schema doesn't have yet (this append is the widening,
    // or ALTER TABLE added it) is missing from every old part and reads
    // back NULL, so it must publish nullable regardless of what the
    // writer claims.
    val published = committed match {
      case None => schema
      case Some(old) => StructType(schema.fields.zipWithIndex.map {
        case (f, i) if i < old.fields.length =>
          // the committed DATATYPE is sticky, but nullability — at
          // BOTH levels — may only WIDEN with the write: a struct
          // append carrying genuinely-null sub-values must publish
          // those sub-fields nullable, or readers would decode NULL
          // at a slot the schema declares non-null (silently wrong
          // under codegen). Narrowing never happens: committed rows
          // under a nullable field may hold nulls forever.
          def widenNulls(o: DataType, n: DataType): DataType = (o, n) match {
            case (os: StructType, ns: StructType)
                if os.fields.length == ns.fields.length =>
              StructType(os.fields.zip(ns.fields).map { case (of, nf) =>
                of.copy(nullable = of.nullable || nf.nullable)
              })
            case _ => o
          }
          val merged = widenNulls(old.fields(i).dataType, f.dataType)
          if (old.fields(i).nullable) old.fields(i).copy(dataType = merged)
          else f.copy(dataType = merged)
        case (f, _) => f.copy(nullable = true)
      })
    }
    val newParts = messages.toSeq.flatMap {
      case m: PartCommit      => Seq(m)
      case m: MultiPartCommit => m.parts
    }.map { m =>
      PartMeta(m.path, m.rows, m.keyMin, m.keyMax, m.bloom,
        m.strMin, m.strMax, bytes = m.bytes, bucket = m.bucket,
        nbuckets = if (m.bucket >= 0) buckets.getOrElse(0) else 0,
        sorted = m.sorted, cstats = m.cstats,
        kNulls = m.keyNulls, sNulls = m.strNulls, kSum = m.keySum)
    }
    replaceFilters match {
      case Some(filters) =>
        // REPLACE WHERE (OverwriteByExpression): ONE atomic snapshot
        // applies the delete-half and the append-half together —
        // parts provably disjoint from the predicate carry forward by
        // reference, provably-all-match parts drop metadata-only,
        // straddling parts get the COW survivor rewrite
        // (ManifestCow.rewriteSurvivors, FALSE/NULL rows survive),
        // and the staged new parts append. Pinned to the base read
        // HERE (strictBase): the classification and the rewrite are
        // valid only against this exact head, so a racing commit
        // fails this overwrite loudly unless footprints are disjoint.
        require(branch.isEmpty, "REPLACE WHERE cannot target a branch " +
          "(its base pin and COW rewrite address the main version line); " +
          "replace on main, or stage plain appends on the branch")
        val baseVersion =
          ManifestSink.listVersions(conf.value, path).lastOption.getOrElse(0)
        val baseParts =
          if (baseVersion == 0)
            ManifestSink.readManifestMeta(conf.value, path, None)
          else ManifestSink.readManifestMeta(conf.value, path,
            Some(baseVersion))
        val (touched, rewritten) =
          ManifestCow.rewriteSurvivors(path, published, filters, baseParts)
        ManifestSink.publishRebase(conf.value, path, published, history,
          head => head.filterNot(p => touched.contains(p.path)) ++
            rewritten ++ newParts,
          strictBase = Some(baseVersion), footprint = Some(touched),
          branch = branch, op = opName)
      case None =>
        // The prior part list is NOT captured here: it is re-read from
        // the head inside the commit loop on every claim attempt, so an
        // append racing another committer re-applies `head ++ newParts`
        // on top of whatever actually won — never dropping the winner's
        // parts. EXCEPTION: identity tables pin the snapshot their id
        // mark was derived from (identityBaseVersion) — merging there
        // would issue overlapping ids, so the loser fails and retries
        // with a freshly-derived mark instead.
        try ManifestSink.publishRebase(conf.value, path, published, history,
          head => (if (truncate) Seq.empty else head) ++ newParts,
          strictBase = identityBaseVersion, branch = branch, op = opName,
          strictForkBase = identityForkBase)
        catch {
          case e: java.util.ConcurrentModificationException
              if identityBaseVersion.isDefined =>
            throw new java.util.ConcurrentModificationException(
              s"identity-column append to $path lost a commit race: the id " +
                "high-water mark was derived from snapshot " +
                s"${identityBaseVersion.get}, which is no longer the head — " +
                "retry the write (it re-derives the mark); committing anyway " +
                s"would issue overlapping ids. (${e.getMessage})")
        }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case m: PartCommit => fs.delete(new Path(m.path), false)
      case m: MultiPartCommit =>
        m.parts.foreach(p => fs.delete(new Path(p.path), false))
      case _ => ()
    }
  }
}

/** NATIVE STREAMING SINK (`df.writeStream.toTable("cat.ns.t")` —
  * STREAMING_WRITE on the catalog table): each micro-batch epoch
  * appends ONE snapshot through the same commit protocol as a batch
  * write, with EXACTLY-ONCE delivery under micro-batch replay. The
  * idempotence marker IS the snapshot's operation label
  * (`stream:<queryId>:<epochId>` on the version record) — marker and
  * data commit atomically, so there is no crash window between
  * "published" and "marked" the way a sidecar marker file would have;
  * a replayed epoch finds its token on the version line and DROPS its
  * duplicate task output instead of committing (the Delta
  * txnAppId/txnVersion pattern, fused into the snapshot log).
  *
  * The replay check scans version ops BACKWARD from the head and
  * stops at the first of THIS query's stream commits with a lower
  * epoch — O(commits since this query's previous epoch), not
  * O(history), so a long-running stream pays a constant few KB-sized
  * manifest header reads per epoch.
  *
  * Same task-side writers as batch (stats/blooms/bucket/split
  * routing); distribution requirements ride the enclosing Write, so a
  * bucketed table's streaming appends cluster exactly like its batch
  * inserts. Append-mode only: Complete/truncate streaming output
  * replaces the table every epoch — that is a batch overwrite in a
  * foreachBatch, not a log-structured sink. */
private[sources] class ManifestStreamingWrite(
    path: String, schema: StructType, queryId: String,
    conf: SerializableConfiguration, buckets: Option[Int] = None,
    splitBy: Option[String] = None,
    splitTransform: Option[String] = None)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def opToken(epochId: Long) = s"stream:$queryId:$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val dir = new Path(path)
    dir.getFileSystem(conf.value).mkdirs(dir)
    // fresh file token per epoch attempt: replayed epochs write new
    // files, which the skipped commit then deletes
    ManifestStreamingWriterFactory(new ManifestWriterFactory(path, schema,
      java.util.UUID.randomUUID().toString.take(8), conf, buckets, splitBy,
      splitTransform))
  }

  /** True iff some committed version already carries this epoch's
    * token (scanning backward, stopping at an earlier epoch of the
    * same query). */
  private def alreadyCommitted(epochId: Long): Boolean = {
    val prefix = s"stream:$queryId:"
    ManifestSink.listVersions(conf.value, path).reverseIterator
      .map(v => ManifestSink.readOp(conf.value, path, Some(v)))
      .collectFirst {
        case op if op.startsWith(prefix) =>
          op.stripPrefix(prefix).toLong >= epochId
      }.getOrElse(false)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    if (alreadyCommitted(epochId)) { abort(epochId, messages); return }
    val newParts = messages.toSeq.flatMap {
      case m: PartCommit      => Seq(m)
      case m: MultiPartCommit => m.parts
    }.map { m =>
      PartMeta(m.path, m.rows, m.keyMin, m.keyMax, m.bloom,
        m.strMin, m.strMax, bytes = m.bytes, bucket = m.bucket,
        nbuckets = if (m.bucket >= 0) buckets.getOrElse(0) else 0,
        sorted = m.sorted, cstats = m.cstats,
        kNulls = m.keyNulls, sNulls = m.strNulls, kSum = m.keySum)
    }
    ManifestSink.publishRebase(conf.value, path, schema, history = true,
      head => head ++ newParts, strictBase = None, op = opToken(epochId))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case m: PartCommit => fs.delete(new Path(m.path), false)
      case m: MultiPartCommit =>
        m.parts.foreach(p => fs.delete(new Path(p.path), false))
      case _ => ()
    }
  }
}

/** Task-side adapter: streaming epochs reuse the batch writers
  * verbatim (the epoch id is already encoded in the factory's fresh
  * per-epoch file token, so writers stay epoch-ignorant). */
private[sources] final case class ManifestStreamingWriterFactory(
    batch: ManifestWriterFactory)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    batch.createWriter(partitionId, taskId)
}

/** Per-task statistics carried back to the driver at commit.
  * `bytes` is the part file's exact on-disk size — the planner-facing
  * size statistic (estimateStatistics) that lets a pruned scan report
  * its true residual footprint instead of a width guess. */
private[sources] case class PartCommit(
    path: String, rows: Long, keyMin: Long, keyMax: Long, bloom: String,
    strMin: Option[String] = None, strMax: Option[String] = None,
    bytes: Long = 0L, bucket: Int = -1, sorted: Boolean = false,
    cstats: Map[String, ColStat] = Map.empty,
    keyNulls: Long = -1L, strNulls: Long = -1L,
    keySum: Option[Long] = None)
    extends WriterCommitMessage

/** A bucketed task commits one message carrying one PartCommit per
  * bucket it actually wrote. */
private[sources] case class MultiPartCommit(parts: Seq[PartCommit])
    extends WriterCommitMessage

private[sources] class ManifestWriterFactory(
    path: String, schema: StructType, token: String,
    private[sources] val conf: SerializableConfiguration,
    buckets: Option[Int] = None,
    splitBy: Option[String] = None,
    splitTransform: Option[String] = None)
    extends DataWriterFactory {
  // SECONDARY-COLUMN BLOOMS (`graft.bloom_cols` table property):
  // resolved HERE because every factory is constructed on the DRIVER
  // (batch, streaming, staging, row-level rewrite) — executors get
  // the list via the serialized factory, never re-reading the props
  // sidecar per task. Capped at 4 columns: each bloom costs up to
  // 8 KB of manifest line per part, the same budget as the key bloom.
  private val bloomCols: Seq[String] = ManifestSink.bloomCols(conf.value, path)
  private val bloomBitsN: Int = ManifestSink.bloomBits(conf.value, path)

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    buckets match {
      case Some(n) =>
        new BucketedManifestWriter(path, schema, token, partitionId, taskId,
          conf.value, n, bloomCols, bloomBitsN)
      case None => splitBy match {
        case Some(c) =>
          new SplitManifestWriter(path, schema, token, partitionId, taskId,
            conf.value, c, bloomCols, bloomBitsN, splitTransform)
        case None =>
          new ManifestDataWriter(path, schema, token, partitionId, taskId,
            conf.value, bloomCols = bloomCols, bloomBits = bloomBitsN)
      }
    }
}

/** HASH-BUCKETED writer (`option("buckets", n)`): routes each row to
  * its [[graft.functions.GraftBucket]] ordinal on the first BIGINT
  * column and writes ONE PART FILE PER BUCKET TOUCHED — the storage
  * layout behind scan-reported KeyGroupedPartitioning and hence
  * storage-partitioned joins. An ingest job pre-clustered with
  * `repartition(n, GraftBucket.bucketId(col, n))` writes exactly one
  * file per bucket; an arbitrary layout still commits CORRECT bucket
  * metadata, just more files (compaction packs them later — the read
  * side groups by bucket ordinal either way). */
private[sources] class BucketedManifestWriter(
    dir: String, schema: StructType, token: String,
    partitionId: Int, taskId: Long, conf: Configuration, n: Int,
    bloomCols: Seq[String] = Nil, bloomBits: Int = PartBloom.MaxBits)
    extends DataWriter[InternalRow] {

  private val keyIdx = schema.fields.indexWhere(_.dataType == LongType)
  private val writers =
    new java.util.HashMap[Int, ManifestDataWriter]()

  private def writerFor(b: Int): ManifestDataWriter = {
    var w = writers.get(b)
    if (w == null) {
      w = new ManifestDataWriter(dir, schema, token, partitionId, taskId,
        conf, suffix = s"-b$b", bloomCols = bloomCols,
        bloomBits = bloomBits)
      writers.put(b, w)
    }
    w
  }

  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  override def write(row: InternalRow): Unit = {
    val b =
      if (row.isNullAt(keyIdx)) 0
      else graft.functions.GraftBucket.id(row.getLong(keyIdx), n)
    writerFor(b).write(row)
  }

  override def commit(): WriterCommitMessage = {
    val parts = writers.entrySet().iterator()
    val out = Seq.newBuilder[PartCommit]
    while (parts.hasNext) {
      val e = parts.next()
      out += e.getValue.commit().asInstanceOf[PartCommit]
        .copy(bucket = e.getKey)
    }
    MultiPartCommit(out.result())
  }

  override def abort(): Unit = {
    val it = writers.values().iterator()
    while (it.hasNext) it.next().abort()
  }

  override def close(): Unit = ()
}

/** IDENTITY-PARTITIONED writer (`option("splitBy", c)`): routes each
  * row to a sub-writer keyed by the column's VALUE and writes ONE PART
  * FILE PER DISTINCT VALUE the task sees — combined with the write's
  * clustered distribution (each value shuffled to one task) the table
  * commits exactly one single-valued part per value per write. The
  * per-part stats then record min==max on the column, which is what
  * lets the scan answer `GROUP BY c` from the manifest alone and
  * prune `c = v` to the value's parts. NULL is its own partition
  * (SQL GROUP BY groups nulls together). The cardinality cap fails
  * LOUDLY: identity-partitioning a high-cardinality column is a
  * layout bug at any scale (millions of tiny files), not something to
  * paper over. */
private[sources] class SplitManifestWriter(
    dir: String, schema: StructType, token: String,
    partitionId: Int, taskId: Long, conf: Configuration, splitCol: String,
    bloomCols: Seq[String] = Nil, bloomBits: Int = PartBloom.MaxBits,
    transform: Option[String] = None)
    extends DataWriter[InternalRow] {

  private val MaxValuesPerTask = 512
  private val idx = schema.fields.indexWhere(_.name == splitCol)
  require(idx >= 0, s"splitBy column '$splitCol' not in schema")
  // time-transform split: route by the DERIVED day/hour ordinal of
  // the TIMESTAMP column (micros are the internal long) — every part
  // lands single-valued in the ordinal domain, which the column's
  // recorded micros stats prove (one ordinal spans one micros range)
  private val unit: Long = transform.map(TimeSplit.unit).getOrElse(0L)
  transform.foreach { t =>
    require(schema.fields(idx).dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"time transform '$t' needs a TIMESTAMP splitBy column, " +
        s"'$splitCol' is ${schema.fields(idx).dataType.simpleString}")
  }
  private val isLong = schema.fields(idx).dataType == LongType
  private val writers =
    new java.util.HashMap[Any, ManifestDataWriter]()

  private def writerFor(v: Any): ManifestDataWriter = {
    var w = writers.get(v)
    if (w == null) {
      require(writers.size() < MaxValuesPerTask,
        s"splitBy column '$splitCol' exceeded $MaxValuesPerTask distinct " +
          "values in one write task — identity partitioning needs a " +
          "low-cardinality column (bucket or cluster high-cardinality ones)")
      w = new ManifestDataWriter(dir, schema, token, partitionId, taskId,
        conf, suffix = s"-v${writers.size()}", bloomCols = bloomCols,
        bloomBits = bloomBits)
      writers.put(v, w)
    }
    w
  }

  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  override def write(row: InternalRow): Unit = {
    val v: Any =
      if (row.isNullAt(idx)) null
      else if (unit > 0L)
        java.lang.Long.valueOf(Math.floorDiv(row.getLong(idx), unit))
      else if (isLong) java.lang.Long.valueOf(row.getLong(idx))
      else row.getUTF8String(idx).toString
    writerFor(v).write(row)
  }

  override def commit(): WriterCommitMessage = {
    val parts = writers.values().iterator()
    val out = Seq.newBuilder[PartCommit]
    while (parts.hasNext)
      out += parts.next().commit().asInstanceOf[PartCommit]
    MultiPartCommit(out.result())
  }

  override def abort(): Unit = {
    val it = writers.values().iterator()
    while (it.hasNext) it.next().abort()
  }

  override def close(): Unit = ()
}

/** Executor-side writer: stages `part-<token>-<partition>-<task>` and
  * tracks rows + min/max of the first LongType column while writing. */
private[sources] class ManifestDataWriter(
    dir: String, schema: StructType, token: String,
    partitionId: Int, taskId: Long, conf: Configuration,
    suffix: String = "", bloomCols: Seq[String] = Nil,
    bloomBits: Int = PartBloom.MaxBits)
    extends DataWriter[InternalRow] {

  private val file =
    new Path(dir, s"part-$token-$partitionId-$taskId$suffix.csv")
  private val fs = file.getFileSystem(conf)
  private val out = fs.create(file, true)
  private val keyIdx = schema.fields.indexWhere(_.dataType == LongType)
  private val strIdx = schema.fields.indexWhere(
    _.dataType == org.apache.spark.sql.types.StringType)
  private var rows = 0L
  private var bytes = 0L
  private var kMin = Long.MaxValue
  private var kMax = Long.MinValue
  // DETECTED sortedness: the part is key-sorted iff every key arrived
  // non-decreasing and none was null — detection beats declaration
  // (any write path that happens to produce sorted runs gets the
  // sort-free-join credit, including compaction and clustered writes)
  private var sorted = true
  private var lastKey = Long.MinValue
  // min/max of the first string column in UTF8 BINARY order (the
  // same collation Spark's string comparisons and the reader's
  // pruning use) — tracked as UTF8String to avoid per-row decode
  private var sMin: org.apache.spark.unsafe.types.UTF8String = null
  private var sMax: org.apache.spark.unsafe.types.UTF8String = null
  // GENERALIZED per-column stats (see [[ColStat]]): every ADDITIONAL
  // long/string column beyond the primary pair, capped at 8 of each
  // to bound manifest width — a few long-or-string `while` updates
  // per row, the price of pruning on any predicate column at read
  // TIMESTAMP columns ride the long legs verbatim (micros ARE the
  // internal long) — min/max/null stats feed time-range part pruning
  // and the days()/hours() split layout's derived partition values
  private val extraLong: Array[Int] = schema.fields.indices
    .filter(i => (schema.fields(i).dataType == LongType ||
      schema.fields(i).dataType ==
        org.apache.spark.sql.types.TimestampType) && i != keyIdx)
    .take(8).toArray
  private val extraStr: Array[Int] = schema.fields.indices
    .filter(i => schema.fields(i).dataType ==
      org.apache.spark.sql.types.StringType && i != strIdx)
    .take(8).toArray
  private val eLMin = Array.fill(extraLong.length)(Long.MaxValue)
  private val eLMax = Array.fill(extraLong.length)(Long.MinValue)
  private val eSMin =
    new Array[org.apache.spark.unsafe.types.UTF8String](extraStr.length)
  private val eSMax =
    new Array[org.apache.spark.unsafe.types.UTF8String](extraStr.length)
  // NULL COUNTS per tracked column — the third leg of the file-stats
  // triple (min/max/null_count): IS [NOT] NULL part pruning and
  // metadata-only COUNT(col) both answer from these
  private var keyNulls = 0L
  private var strNulls = 0L
  private val eLNulls = Array.fill(extraLong.length)(0L)
  private val eSNulls = Array.fill(extraStr.length)(0L)
  // EXACT SUMS of every tracked long column (non-null values, exact
  // arithmetic: a per-part overflow marks the column's sum untracked
  // rather than wrapping) — the 4th stats leg, turning a global SUM
  // into a metadata-only pushed aggregate
  private var keySum = 0L
  private var keySumOk = true
  private val eLSum = Array.fill(extraLong.length)(0L)
  private val eLSumOk = Array.fill(extraLong.length)(true)
  // built at max size while streaming (final row count unknown),
  // folded to the row-count-sized filter at commit — see PartBloom
  private val bloom = if (keyIdx >= 0) PartBloom.newBits() else null
  // SECONDARY-COLUMN BLOOMS: one filter per declared STRING column
  // (graft.bloom_cols), fed the stable 64-bit hash of each value's
  // UTF-8 bytes — attached to the column's ColStat at commit
  private val bloomStrIdx: Array[Int] = bloomCols
    .map(c => schema.fields.indexWhere(f =>
      f.name.equalsIgnoreCase(c) &&
        f.dataType == org.apache.spark.sql.types.StringType))
    .filter(_ >= 0).toArray
  private val colBlooms: Array[Array[Long]] =
    Array.fill(bloomStrIdx.length)(PartBloom.newBits(bloomBits))

  /** Row-level rewrites deliver (metadata, row) pairs; the manifest
    * writer needs no per-row metadata (the rewrite's replaced-part
    * accounting lives on the scan side), so the metadata row is
    * simply dropped. */
  override def write(metadata: InternalRow, row: InternalRow): Unit =
    write(row)

  override def write(row: InternalRow): Unit = {
    val line = (ManifestCodec.encode(row, schema) + "\n").getBytes("UTF-8")
    out.write(line)
    rows += 1
    bytes += line.length
    if (keyIdx >= 0 && !row.isNullAt(keyIdx)) {
      val k = row.getLong(keyIdx)
      if (k < kMin) kMin = k
      if (k > kMax) kMax = k
      if (k < lastKey) sorted = false
      lastKey = k
      PartBloom.add(bloom, k)
      if (keySumOk)
        try keySum = Math.addExact(keySum, k)
        catch { case _: ArithmeticException => keySumOk = false }
    } else if (keyIdx >= 0) { sorted = false; keyNulls += 1 }
    if (strIdx >= 0 && !row.isNullAt(strIdx)) {
      val s = row.getUTF8String(strIdx)
      if (sMin == null || s.compareTo(sMin) < 0) sMin = s.clone()
      if (sMax == null || s.compareTo(sMax) > 0) sMax = s.clone()
    } else if (strIdx >= 0) strNulls += 1
    var i = 0
    while (i < extraLong.length) {
      val idx = extraLong(i)
      if (!row.isNullAt(idx)) {
        val v = row.getLong(idx)
        if (v < eLMin(i)) eLMin(i) = v
        if (v > eLMax(i)) eLMax(i) = v
        if (eLSumOk(i))
          try eLSum(i) = Math.addExact(eLSum(i), v)
          catch { case _: ArithmeticException => eLSumOk(i) = false }
      } else eLNulls(i) += 1
      i += 1
    }
    i = 0
    while (i < extraStr.length) {
      val idx = extraStr(i)
      if (!row.isNullAt(idx)) {
        val s = row.getUTF8String(idx)
        if (eSMin(i) == null || s.compareTo(eSMin(i)) < 0) eSMin(i) = s.clone()
        if (eSMax(i) == null || s.compareTo(eSMax(i)) > 0) eSMax(i) = s.clone()
      } else eSNulls(i) += 1
      i += 1
    }
    i = 0
    while (i < bloomStrIdx.length) {
      val idx = bloomStrIdx(i)
      if (!row.isNullAt(idx))
        PartBloom.add(colBlooms(i), PartBloom.strKey(row.getUTF8String(idx)))
      i += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val hex =
      if (bloom == null || kMin > kMax) "" // no key column / no non-null keys
      else PartBloom.toHex(PartBloom.shrinkFor(bloom, rows))
    // declared secondary blooms by column name (non-empty filters
    // only — an all-null column writes no bloom)
    val colBloomHex: Map[String, String] = bloomStrIdx.indices.collect {
      case i if colBlooms(i).exists(_ != 0L) =>
        schema.fields(bloomStrIdx(i)).name ->
          PartBloom.toHex(PartBloom.shrinkFor(colBlooms(i), rows))
    }.toMap
    val cstats: Map[String, ColStat] =
      (extraLong.indices.collect {
        case i if eLMin(i) <= eLMax(i) =>
          schema.fields(extraLong(i)).name ->
            ColStat('l', eLMin(i).toString, eLMax(i).toString, eLNulls(i),
              if (eLSumOk(i)) Some(eLSum(i)) else None)
      } ++ extraStr.indices.collect {
        case i if eSMin(i) != null =>
          val name = schema.fields(extraStr(i)).name
          name -> ColStat('s', eSMin(i).toString, eSMax(i).toString,
            eSNulls(i), bloom = colBloomHex.getOrElse(name, ""))
      } ++
        // the PRIMARY string column's min/max ride the line's own
        // smin/smax fields, not cstats — a declared bloom on it still
        // needs a ColStat carrier (min/max duplicated, harmless)
        (if (strIdx >= 0 && sMin != null &&
             colBloomHex.contains(schema.fields(strIdx).name))
           Seq(schema.fields(strIdx).name ->
             ColStat('s', sMin.toString, sMax.toString, strNulls,
               bloom = colBloomHex(schema.fields(strIdx).name)))
         else Nil)).toMap
    PartCommit(file.toString, rows, kMin, kMax, hex,
      Option(sMin).map(_.toString), Option(sMax).map(_.toString), bytes,
      sorted = keyIdx >= 0 && rows > 0 && sorted, cstats = cstats,
      keyNulls = if (keyIdx >= 0) keyNulls else -1L,
      strNulls = if (strIdx >= 0) strNulls else -1L,
      // an all-null/empty part records Some(0): the sum over zero
      // non-null values is additively 0 (the NULL-vs-0 decision for
      // SQL SUM belongs to the fold, which has the null counts)
      keySum = if (keyIdx >= 0 && keySumOk) Some(keySum) else None)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
