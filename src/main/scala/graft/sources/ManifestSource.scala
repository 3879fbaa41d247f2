package graft.sources

import java.util
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 READ path over a [[ManifestSink]]-committed table —
  * closing the warehouse loop: what one job commits (part files + a
  * `_MANIFEST.json` carrying the schema and per-part key statistics),
  * a later job scans with metadata-level pruning, never trusting the
  * directory listing.
  *
  *  - The schema comes from the manifest header, not from sampling
  *    files (self-describing table, like any modern table format).
  *  - Only files LISTED in the manifest are planned: orphans from
  *    failed attempts are invisible to readers by construction.
  *  - Range predicates on the key column (the first LongType field —
  *    the same convention the writer's min/max tracker uses) prune
  *    whole part files at planning time against the manifest's
  *    per-part (min, max): the DSv2 analog of data skipping on footer
  *    statistics. Pushed filters are also reported as residual, so
  *    Spark re-evaluates them row-level — a pruning bound mistake
  *    could only cost performance, never rows.
  *  - Column pruning reaches the decoder: an unused column is split
  *    but never parsed/allocated.
  *  - `estimateStatistics` reports the POST-PRUNING row count from the
  *    manifest, so the planner can (e.g.) pick a broadcast join for a
  *    selectively-scanned table.
  *
  * All filesystem access uses the session Hadoop configuration:
  * captured on the driver, shipped to readers via
  * [[SerializableConfiguration]] — same discipline as the sink.
  *
  * At 100 TB, manifest-listed planning + stats pruning is the
  * difference between "scan 100k files to answer a keyed lookup" and
  * "open the three parts whose range can match".
  */
class ManifestSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "option 'path' is required")
    ManifestSink.readSchema(ManifestSink.driverConf(), path).getOrElse(
      throw new IllegalArgumentException(
        s"no committed manifest (with schema header) at $path"))
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ManifestReadTable(properties.get("path"), schema)
}

private[sources] class ManifestReadTable(path: String, schema: StructType)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "option 'path' is required")
  override def name(): String = s"manifest($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path, schema,
      new SerializableConfiguration(ManifestSink.driverConf()))
}

private[sources] class ManifestScanBuilder(
    path: String, schema: StructType, conf: SerializableConfiguration)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  // the writer tracked min/max of the first LongType column; the
  // reader prunes on exactly the same column
  private val keyCol: Option[String] =
    schema.fields.find(_.dataType == LongType).map(_.name)

  private var required: StructType = schema
  private var keyLo: Long = Long.MinValue // inclusive
  private var keyHi: Long = Long.MaxValue // inclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept range/point predicates on the key column for part pruning;
    * report every filter as residual (Spark re-evaluates row-level). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def isKey(c: String) = keyCol.contains(c)
    filters.foreach {
      case GreaterThan(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, if (v == Long.MaxValue) v else v + 1)
      case GreaterThanOrEqual(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, v)
      case LessThan(c, v: Long) if isKey(c) =>
        keyHi = math.min(keyHi, if (v == Long.MinValue) v else v - 1)
      case LessThanOrEqual(c, v: Long) if isKey(c) =>
        keyHi = math.min(keyHi, v)
      case EqualTo(c, v: Long) if isKey(c) =>
        keyLo = math.max(keyLo, v); keyHi = math.min(keyHi, v)
      case In(c, vs) if isKey(c) && vs.nonEmpty =>
        val longs = vs.collect { case v: Long => v }
        if (longs.length == vs.length) { // only prune when ALL values are typed
          keyLo = math.max(keyLo, longs.min); keyHi = math.min(keyHi, longs.max)
        }
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThan(c, _: Long)        => isKey(c)
      case GreaterThanOrEqual(c, _: Long) => isKey(c)
      case LessThan(c, _: Long)           => isKey(c)
      case LessThanOrEqual(c, _: Long)    => isKey(c)
      case EqualTo(c, _: Long)            => isKey(c)
      case In(c, _)                       => isKey(c)
      case _                              => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // plan against the manifest on the DRIVER: only committed parts,
    // and only those whose key range can intersect [keyLo, keyHi].
    // Null-key rows are safe to skip under a key predicate (three-
    // valued logic: no key comparison is ever TRUE for NULL), and a
    // part whose keys are all NULL carries the (MaxValue, MinValue)
    // sentinel, so any real bound prunes it; with no pushed bounds
    // nothing is pruned.
    val all = ManifestSink.readManifest(conf.value, path)
    val kept = all.filter { case (_, _, kMin, kMax) =>
      !(kMax < keyLo || kMin > keyHi)
    }
    new ManifestScan(kept, schema, required, conf, all.size)
  }
}

private[sources] class ManifestScan(
    parts: Seq[(String, Long, Long, Long)],
    schema: StructType, required: StructType,
    conf: SerializableConfiguration, totalParts: Int)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.ManifestScan(parts=${parts.size}/$totalParts)"

  override def planInputPartitions(): Array[InputPartition] =
    parts.map { case (p, rows, _, _) => ManifestPartition(p, rows) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema, required.fieldNames, conf)

  /** Post-pruning stats straight from the manifest — exact row count,
    * width-estimated bytes. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = parts.map(_._2).sum
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(1L, n * required.defaultSize))
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }
}

private[sources] case class ManifestPartition(path: String, rows: Long)
    extends InputPartition

private[sources] class ManifestReaderFactory(
    schema: StructType, fields: Array[String],
    conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ManifestPartition]
    // required-field ordinals into the full written row
    val ordinals = fields.map(f => schema.fieldIndex(f))
    val types = ordinals.map(i => schema.fields(i).dataType)
    new PartitionReader[InternalRow] {
      private val path = new Path(part.path)
      private val in = path.getFileSystem(conf.value).open(path)
      private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val cols = lines.next().split(",", -1)
          val vals = new Array[Any](ordinals.length)
          var j = 0
          while (j < ordinals.length) {
            vals(j) = ManifestCodec.decode(cols(ordinals(j)), types(j))
            j += 1
          }
          current = new GenericInternalRow(vals)
          true
        }

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

/** Line codec shared by [[ManifestSink]]'s writer and
  * [[ManifestSource]]'s reader. Atomic types only (the repo-wide
  * scalar-output convention). Strings are URL-encoded so the comma
  * separator, newlines, and arbitrary unicode round-trip; NULL is the
  * `\N` sentinel (which an encoded string can never produce — the
  * encoder escapes backslash), so NULL and empty string stay
  * distinct. */
private[sources] object ManifestCodec {
  private val NullToken = "\\N"

  def encode(row: InternalRow, schema: StructType): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < schema.fields.length) {
      if (i > 0) sb.append(',')
      if (row.isNullAt(i)) sb.append(NullToken)
      else schema.fields(i).dataType match {
        case StringType =>
          sb.append(java.net.URLEncoder.encode(row.getUTF8String(i).toString, "UTF-8"))
        case dt => sb.append(row.get(i, dt).toString)
      }
      i += 1
    }
    sb.toString
  }

  def decode(s: String, dt: DataType): Any =
    if (s == NullToken) null
    else dt match {
      case LongType      => s.toLong
      case IntegerType   => s.toInt
      case ShortType     => s.toShort
      case ByteType      => s.toByte
      case DoubleType    => s.toDouble
      case FloatType     => s.toFloat
      case BooleanType   => s.toBoolean
      case TimestampType => s.toLong // micros, as the writer printed it
      case DateType      => s.toInt  // days
      case StringType    =>
        UTF8String.fromString(java.net.URLDecoder.decode(s, "UTF-8"))
      case d: DecimalType =>
        Decimal(new java.math.BigDecimal(s), d.precision, d.scale)
      case other =>
        throw new UnsupportedOperationException(
          s"manifest codec supports atomic types only, got $other")
    }
}
