package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-replicable 64-bit hash: the top 60 bits of md5, read as a
  * non-negative BIGINT.
  *
  * The hash-driven operators (minhash near-dup, simhash fingerprints,
  * hashed shard buckets) need a hash both engines can compute
  * bit-for-bit — Spark's `xxhash64` has no DuckDB twin, so a query
  * built on it can never be oracle-gated. md5 is standardized: Spark's
  * `conv(substring(md5(x), 1, 15), 16, 10)` and DuckDB's
  * `('0x' || substring(md5(x), 1, 15))::BIGINT` agree on every input,
  * and 15 hex digits (60 bits) always fit a signed 64-bit int, so
  * there is no overflow/sign divergence either.
  *
  * Non-string inputs are cast to string first; BIGINT → VARCHAR
  * renders identical signed decimal text in both engines, so hashing
  * the rendering is engine-stable too.
  *
  * md5 costs more per byte than xxhash64 — a production deployment
  * that does not need a cross-engine oracle swaps `xxhash64` back in
  * through this same seam (the call sites only depend on "64-bit hash
  * of a column").
  */
object OracleHash {

  /** 60-bit md5-derived hash of any column (as non-negative BIGINT). */
  def h64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** DuckDB rendition of [[h64]] over SQL fragment `e`. */
  def h64Sql(e: String): String =
    s"('0x' || substring(md5(CAST(($e) AS VARCHAR)), 1, 15))::BIGINT"
}
