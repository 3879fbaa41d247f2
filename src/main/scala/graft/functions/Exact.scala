package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent exact aggregation helpers.
  *
  * Floating-point SUM is association-order dependent: a 1000-executor
  * shuffle and a single-node oracle will disagree in the last bits, and
  * at 100 TB even run-to-run results differ as partitioning changes.
  * Casting each term to DECIMAL before summing makes the aggregate an
  * exact integer-arithmetic fold — any partitioning, any merge order,
  * same bits. The paired `...Sql` emitters render the identical
  * semantics for the DuckDB oracle.
  */
object Exact {

  /** Exact sum of a double expression, returned as double.
    *
    * The decimal result converts to double THROUGH A STRING: when a
    * sum carries more than 53 bits of significance, Java's
    * decimal→double (BigDecimal, correctly rounded) and DuckDB's
    * (int128 / 10^scale in double arithmetic — two roundings) can
    * differ by 1 ulp; a 10×-data verify run exposed exactly that in
    * q_moment_stats. decimal→text is exact and text→double is
    * correctly rounded in BOTH engines (Double.parseDouble /
    * fast_float), so the string path is bit-identical at any
    * magnitude — the property that matters when the same sums run at
    * 100 TB. */
  def decSum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast("string").cast("double")

  def decSumSql(e: String, scale: Int = 6): String =
    s"CAST(CAST(sum(CAST(($e) AS DECIMAL(30,$scale))) AS VARCHAR) AS DOUBLE)"

  /** Exact-numerator average of a double expression. */
  def decAvg(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast("string").cast("double") /
      count(lit(1))

  def decAvgSql(e: String, scale: Int = 6): String =
    s"(CAST(CAST(sum(CAST(($e) AS DECIMAL(30,$scale))) AS VARCHAR) AS DOUBLE)" +
      " / count(*))"

  /** Exact per-row sum of an Array[Double] column (decimal fold, so
    * element order / engine association cannot change the result). */
  def decSumArr(arr: Column): Column =
    aggregate(
      arr,
      lit(0).cast(DecimalType(30, 12)),
      (acc, x) => (acc + x.cast(DecimalType(20, 12))).cast(DecimalType(30, 12))
    ).cast("double")

  def decSumArrSql(e: String): String =
    s"CAST(list_sum(list_transform($e, x -> CAST(x AS DECIMAL(20,12)))) AS DOUBLE)"

  /** Exact sum-of-squares of an Array[Float] column (vector squared L2
    * norm), the workhorse of the similarity operators. Accumulates in
    * decimal so executor-side evaluation order is irrelevant. Backed
    * by the native [[ExactSumSq]] expression (codegen'd tight loop);
    * [[sumSqDeclarative]] is the built-in-operator rendition it
    * replaced, kept for the equivalence test. */
  def sumSq(arr: Column): Column =
    org.apache.spark.sql.graftbridge.GraftColumns.column(
      ExactSumSq(org.apache.spark.sql.graftbridge.GraftColumns.expression(arr)))

  def sumSqDeclarative(arr: Column): Column =
    aggregate(
      arr,
      lit(0).cast(DecimalType(30, 12)),
      (acc, x) => (acc + (x.cast("double") * x.cast("double")).cast(DecimalType(20, 12)))
        .cast(DecimalType(30, 12))
    ).cast("double")

  def sumSqSql(arr: String): String =
    s"CAST(list_sum(list_transform($arr, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12)))) AS DOUBLE)"

  /** Exact dot product of two Array[Float] columns (native
    * [[ExactDotProduct]] expression; declarative twin below). */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftColumns.column(
      ExactDotProduct(
        org.apache.spark.sql.graftbridge.GraftColumns.expression(a),
        org.apache.spark.sql.graftbridge.GraftColumns.expression(b)))

  def dotFDeclarative(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v.cast(DecimalType(20, 12))).cast(DecimalType(30, 12))
    ).cast("double")

  def dotFSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i -> CAST(CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) AS DECIMAL(20,12)))) AS DOUBLE)"

  /** Exact squared L2 distance between an Array[Float] column and an
    * Array[Double] column (native [[ExactSqDistFD]] kernel — the IVF
    * assignment hot loop; declarative twin below, ExactSpec proves
    * equivalence). */
  def sqDistFD(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftColumns.column(
      ExactSqDistFD(
        org.apache.spark.sql.graftbridge.GraftColumns.expression(a),
        org.apache.spark.sql.graftbridge.GraftColumns.expression(b)))

  def sqDistFDDeclarative(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0).cast(DecimalType(30, 12)),
      (acc, v) => (acc + v.cast(DecimalType(20, 12))).cast(DecimalType(30, 12))
    ).cast("double")

  /** Cosine similarity of two Array[Float] columns (double, exact-dot
    * based so both engines agree bit-for-bit). */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / (sqrt(sumSq(a)) * sqrt(sumSq(b)))

  def cosineFSql(a: String, b: String): String =
    s"(${dotFSql(a, b)} / (sqrt(${sumSqSql(a)}) * sqrt(${sumSqSql(b)})))"
}
