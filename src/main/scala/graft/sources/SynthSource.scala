package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 synthetic observation source — the source-extension
  * point of the engine. It models the reference's S1 prefix scan
  * (/root/reference/queue_time_predictions/preprocess_image.py:22-33 —
  * list a key range, read the objects) as Spark plans it at 100 TB: the
  * "listing" is split into `partitions` independent row-ranges (one
  * task each, no driver-side enumeration of rows), the projection is
  * pushed into the reader (SupportsPushDownRequiredColumns — an unused
  * column is never materialized), and range predicates on `id` prune
  * whole input partitions at planning time (the DSv2 analog of
  * partition pruning; the same filters are also left in the plan for
  * exact row-level evaluation, so pruning is purely an optimization
  * and never a correctness dependency).
  *
  * The generated rows are a pure function of the row index, so a SQL
  * oracle can regenerate them exactly: station = i % 149, value has
  * exactly two decimal digits (a Weyl-style integer hash scaled by
  * 1/100 — bit-identical across engines), ts advances one minute per
  * row from 2024-01-01T00:00:00Z.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "500000").toLong,
      properties.getOrDefault("partitions", "32").toInt)
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("station_id", IntegerType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val Stations = 149
  val Hash = 2654435761L          // Knuth multiplicative hash constant
  val ValueMod = 1000000L
  val TsBaseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
  val TsStepMicros = 60000000L         // one minute per row

  def stationOf(i: Long): Int = (i % Stations).toInt
  def valueOf(i: Long): Double = ((i * Hash) % ValueMod) / 100.0
  def tsOf(i: Long): Long = TsBaseMicros + i * TsStepMicros
}

private[sources] class SynthTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = SynthSource.Schema
  private var idLo: Long = 0L
  private var idHi: Long = Long.MaxValue // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept range predicates on `id` for partition pruning, but report
    * every filter as residual: Spark re-evaluates them row-level, so a
    * bound mistake here could only cost performance, never rows. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThan("id", v: Long)        => idLo = math.max(idLo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => idLo = math.max(idLo, v)
      case LessThan("id", v: Long)           => idHi = math.min(idHi, v)
      case LessThanOrEqual("id", v: Long)    => idHi = math.min(idHi, v + 1)
      case EqualTo("id", v: Long)            =>
        idLo = math.max(idLo, v); idHi = math.min(idHi, v + 1)
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThan("id", _) | GreaterThanOrEqual("id", _) |
           LessThan("id", _) | LessThanOrEqual("id", _) | EqualTo("id", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthScan(rows, partitions, required, idLo, idHi)
}

private[sources] class SynthScan(
    rows: Long, partitions: Int, required: StructType,
    idLo: Long, idHi: Long) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map { start =>
      SynthRange(start, math.min(start + per, rows))
    }.filter(r => r.end > idLo && r.start < idHi) // partition pruning
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private[sources] case class SynthRange(start: Long, end: Long)
    extends InputPartition

private[sources] class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map[Any] {
          case "id"         => i
          case "station_id" => SynthSource.stationOf(i)
          case "ts"         => SynthSource.tsOf(i)
          case "value"      => SynthSource.valueOf(i)
        })
      override def close(): Unit = ()
    }
  }
}
