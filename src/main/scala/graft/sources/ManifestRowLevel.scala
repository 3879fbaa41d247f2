package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** The manifest format's one METADATA COLUMN: `_part`, the committed
  * part file a row was read from — the provenance column (Delta's
  * `_metadata.file_path` analog), and the GROUP IDENTITY the
  * row-level rewrite rides: Spark resolves the operation's
  * requiredMetadataAttributes against this, which switches the
  * ReplaceData write onto the projection path that strips the
  * internal `__row_operation` column and hands the connector clean
  * (metadata, row) pairs. */
private[sources] object PartMetaColumn extends MetadataColumn {
  val Name = "_part"
  override def name(): String = Name
  override def dataType(): DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String =
    "committed part file this row was read from"
}

/** `_pos` — the row's ordinal within its part file (line number).
  * (`_part`, `_pos`) is a stable physical row address: the
  * merge-on-read DELETE builds its deletion vectors from exactly
  * these two columns (Delta's `_metadata.row_index` analog). */
private[sources] object PosMetaColumn extends MetadataColumn {
  val Name = "_pos"
  override def name(): String = Name
  override def dataType(): DataType = org.apache.spark.sql.types.LongType
  override def isNullable: Boolean = false
  override def comment(): String =
    "row ordinal within its part file"
}

/** GROUP-BASED (copy-on-write) row-level operations for the manifest
  * format — what turns SQL `UPDATE`, `MERGE INTO`, and arbitrary
  * `DELETE` into first-class DML on catalog tables (the Iceberg
  * copy-on-write shape; Spark's `RewriteUpdateTable` /
  * `RewriteMergeIntoTable` / `RewriteDeleteFromTable` plan a
  * ReplaceData over this operation when the metadata/COW fast paths
  * don't apply).
  *
  * The "group" is the PART FILE. The contract with Spark's
  * group-based rewrite:
  *
  *  1. the operation's scan reads candidate parts — pruned STATICALLY
  *     by whatever command predicates reference the key column, and
  *     at RUNTIME by the matched-key dynamic filter
  *     (`RowLevelOperationRuntimeGroupFiltering` feeds the scan's
  *     SupportsRuntimeV2Filtering, so parts that provably hold no
  *     matched row are never read OR rewritten);
  *  2. Spark re-emits EVERY surviving row of the scanned parts
  *     (changed and carried-over alike) into this operation's write;
  *  3. commit publishes `head − scannedParts + newParts` as the next
  *     snapshot — unscanned parts carry forward BY REFERENCE, the
  *     superseded files stay on disk for time travel (vacuum owns
  *     their retirement), exactly like [[ManifestCow]].
  *
  * Concurrency: the rewrite is planned against one head, so the
  * commit pins that base version (`strictBase`) — a commit racing the
  * rewrite fails THIS operation loudly instead of silently dropping
  * either side's rows (same policy as the COW DELETE path).
  *
  * At 100 TB this is the difference between "UPDATE rewrites the
  * table" and "UPDATE rewrites the handful of parts that contain
  * matched keys": the dynamic group filter + manifest stats/bloom
  * bound the rewrite by the MATCH footprint, not the table size.
  */
private[sources] class ManifestRowLevelOp(
    path: String, schema: StructType,
    cmd: RowLevelOperation.Command,
    val branch: Option[String] = None) extends RowLevelOperation {

  // (scanned parts, base version) recorded by the scan at plan time —
  // volatile: planInputPartitions runs on a scheduler thread.
  // The base version is resolved by ManifestScanBuilder.build() from
  // the SAME head read that produced the part list — re-reading the
  // log here (execution time) could observe a commit that landed
  // after the plan, making strictBase pin the WRONG (newer) version
  // and silently voiding the lost-update guard.
  @volatile private var scanState: Option[(Seq[PartMeta], Int)] = None

  private[sources] def recordScan(parts: Seq[PartMeta], base: Int): Unit =
    scanState = Some((parts, base))

  private[sources] def scannedOrFail: (Seq[PartMeta], Int) =
    scanState.getOrElse(throw new IllegalStateException(
      s"row-level write on $path committed before its scan planned"))

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft.rowlevel($cmd, $path)"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(PartMetaColumn.Name))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path, schema,
      new SerializableConfiguration(ManifestSink.driverConf()),
      version = None, cdf = false, rowLevelOwner = Some(this),
      branch = branch)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new ManifestReplaceWrite(path, info.schema(), ManifestRowLevelOp.this,
            new SerializableConfiguration(ManifestSink.driverConf()))
      }
    }
}

/** The replacement-data commit: stages parts exactly like a normal
  * write, then swaps the scanned parts for the new ones in a single
  * snapshot pinned to the rewrite's base version. */
private[sources] class ManifestReplaceWrite(
    path: String, schema: StructType, op: ManifestRowLevelOp,
    conf: SerializableConfiguration) extends BatchWrite {

  private val token = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    dir.getFileSystem(conf.value).mkdirs(dir)
    val f = new ManifestWriterFactory(path, schema, token, conf)
    // MERGE INSERT cannot generate identity/generated values on this
    // path; a NULL in a computed slot refuses rather than landing
    val guard = ComputedColumns.guardSlots(conf.value, path, schema)
    if (guard.isEmpty) f else ComputedNullGuardFactory(f, schema, guard)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newParts = messages.toSeq.map { case m: PartCommit =>
      PartMeta(m.path, m.rows, m.keyMin, m.keyMax, m.bloom,
        m.strMin, m.strMax, bytes = m.bytes, cstats = m.cstats,
        kNulls = m.keyNulls, sNulls = m.strNulls, kSum = m.keySum)
    }.filter(_.rows > 0) // an all-deleted group needs no empty part
    val (replaced, base) = op.scannedOrFail
    val replacedPaths = replaced.map(_.path).toSet
    // footprint = the scanned (replaced) parts: a concurrent commit
    // that only touched OTHER parts composes — its parts carry
    // forward through the head-aware rebase; one that dropped or
    // re-vectored a scanned part conflicts loudly
    ManifestSink.publishRebase(conf.value, path, schema, history = true,
      head => head.filterNot(p => replacedPaths.contains(p.path)) ++ newParts,
      strictBase = Some(base), footprint = Some(replacedPaths),
      branch = op.branch,
      op = op.command().toString.toLowerCase)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.foreach {
      case m: PartCommit => fs.delete(new Path(m.path), false)
      case _ => ()
    }
  }
}
