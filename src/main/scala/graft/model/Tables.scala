package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Table loaders + explicit schemas for the driver test tables.
  *
  * Schemas are declared explicitly (never inferred) mirroring the
  * reference's fixed/hard-coded schema style (reference:
  * queue_time_predictions/estimate_queue.py:15-28 `ModelSpec`;
  * test/conftest.py:11-21 DynamoDB AttributeDefinitions). The explicit
  * StructType is required for Structured Streaming file sources and
  * doubles as documentation of the engine's data model.
  *
  * At 100 TB these reads are partitioned parquet scans; Catalyst pushes
  * filters and prunes columns into the scan, so loaders stay plain
  * `spark.read.parquet` with no eager action.
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.ts has shipped as BOTH parquet timestamp[ns] (earlier
    * generator runs) and timestamp[us] (current). Spark 4 refuses to
    * read ns as TimestampType, so the session keeps the legacy
    * ns-as-long conf on and this loader dispatches on the type the
    * reader actually yields: LongType ⇒ floor-divide ns→µs (the same
    * truncation DuckDB applies), TimestampType ⇒ pass through. Either
    * storage flavor lands on the same logical TimestampType column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (!spark.conf.getOption(NanosConf).contains("true"))
      spark.conf.set(NanosConf, "true")
    eventsFromStorage(load(spark, dir, "events"))
  }

  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events STORAGE schema, needed for readStream (streaming sources
    * cannot infer). Matches the current generator output: parquet
    * timestamp[us] reads natively as TimestampType. */
  val eventsStorageSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Storage-schema rows → the logical events shape (ts: TimestampType
    * at µs precision). Dispatches on the ts type actually read so every
    * storage flavor normalizes identically: long ns under [[NanosConf]]
    * floor-divides to µs; parquet timestamp[us] with isAdjustedToUTC=
    * false infers TIMESTAMP_NTZ and is cast to TimestampType (exact
    * under the UTC session timezone every entry point sets — the same
    * instant DuckDB's naive-UTC read produces). Queries downstream
    * always see the LTZ TimestampType they were written against
    * (unix_micros &co. reject NTZ). */
  def eventsFromStorage(df: DataFrame): DataFrame = {
    val norm = df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
    norm.select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType),
  ))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))
}

/** Typed record for the Dataset[T] (typed) surface of the pipeline:
  * the enriched prediction upserted to the keyed sink (reference:
  * estimate_queue.py:189-192) — the flagship's output schema
  * (`Pipeline.estimateQueue(...).as[Prediction]`). */
case class Prediction(
    station_id: Long,
    obs_ts: Long,
    x_pos: Double,
    lanes: Double,
    queue_full: Double,
    meters: Double,
    cars: Double,
    expected_queue_time: Double)
