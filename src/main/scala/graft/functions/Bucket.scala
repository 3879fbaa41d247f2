package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** The engine's BUCKET function — the one hash that storage bucketing,
  * the SQL `bucket(n, k)` catalog function, and the scan-reported
  * `KeyGroupedPartitioning` all share. Identity of this function
  * across writer and reader is what makes storage-partitioned joins
  * SOUND: two tables written with the same (n, key-column) spec hold
  * any given key in the same bucket ordinal, so Spark can zip their
  * bucket partitions pairwise with no shuffle.
  *
  * splitmix64 finalizer then floor-mod — sequential keys (the common
  * surrogate-key shape) spread uniformly instead of striping, and the
  * function is three multiplies + shifts, trivially codegen-able.
  * NULL keys deterministically land in bucket 0. */
object GraftBucket {

  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def id(key: Long, n: Int): Int =
    java.lang.Math.floorMod(mix(key), n.toLong).toInt

  /** `bucket_id(col, n)` as a Column — what an ingest job uses to
    * pre-cluster (`repartition(n, bucketId(col, n))`) so the bucketed
    * sink writes one file per bucket per task instead of a fan-out. */
  def bucketId(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.GraftColumns.column(
      BucketIdExpr(
        org.apache.spark.sql.graftbridge.GraftColumns.expression(c), n))
}

/** Codegen'd bucket ordinal of a BIGINT key (see [[GraftBucket]]). */
case class BucketIdExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bucket_id"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else GraftBucket.id(v.asInstanceOf[Long], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val nb = n
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0 :
          graft.functions.GraftBucket.id(${c.value}, $nb);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIdExpr =
    copy(child = newChild)
}
