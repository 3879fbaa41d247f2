package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Tight-loop kernels for the exact (decimal-accumulated) vector
  * operations. Each product is rounded to scale 12 exactly like
  * Spark's double→DECIMAL(20,12) cast (shortest-repr BigDecimal,
  * HALF_UP), then summed exactly — bit-identical to the declarative
  * `aggregate`/`zip_with` fold these kernels replace, at a fraction
  * of its interpreted per-element overhead. Null elements or
  * mismatched lengths yield NULL, matching zip_with/fold poisoning. */
object ExactNumeric {

  private def round12(p: Double): JBigDecimal =
    JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)

  /** Exact decimal dot product of two float arrays, boxed-null on
    * null elements / length mismatch. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var sum = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum = sum.add(round12(a.getFloat(i).toDouble * b.getFloat(i).toDouble))
      i += 1
    }
    java.lang.Double.valueOf(sum.doubleValue())
  }

  /** Exact decimal squared L2 distance between a FLOAT vector and a
    * DOUBLE vector (the IVF assignment hot loop: corpus embedding vs
    * broadcast centroid). Each (a−b)² term is rounded to scale 12
    * exactly like the declarative `(acc + v.cast(DECIMAL(20,12)))`
    * fold it replaces — bit-identical result, JIT-compiled loop. */
  def sqDistFDOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var sum = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      sum = sum.add(round12(d * d))
      i += 1
    }
    java.lang.Double.valueOf(sum.doubleValue())
  }

  /** Exact decimal sum of squares of a float array. */
  def sumSqOrNull(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var sum = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      sum = sum.add(round12(x * x))
      i += 1
    }
    java.lang.Double.valueOf(sum.doubleValue())
  }
}

/** Native Catalyst expression for the exact dot product of two
  * Array[Float] columns — extension point (b) of the build rules:
  * when composition of built-in operators (here: interpreted
  * zip_with/aggregate higher-order folds, which never enter codegen)
  * is the bottleneck, a native Expression with doGenCode keeps the
  * hot loop inside whole-stage codegen as a single JIT-compiled call.
  * Semantics identical to `Exact.dotFDeclarative` (ExactSpec proves
  * equivalence; every cosine oracle hash-checks it). */
case class ExactDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ExactNumeric.dotOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.ExactNumeric.dotOrNull($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native exact squared L2 distance between an Array[Float] column
  * and an Array[Double] column; see [[ExactDotProduct]]. Semantics
  * identical to the declarative zip_with/aggregate decimal fold
  * (ExactSpec proves equivalence). */
case class ExactSqDistFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ExactNumeric.sqDistFDOrNull(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("sqd")
      s"""
         |java.lang.Double $tmp = graft.functions.ExactNumeric.sqDistFDOrNull($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExactSqDistFD =
    copy(left = newLeft, right = newRight)
}

/** Native exact sum-of-squares (squared L2 norm) of an Array[Float]
  * column; see [[ExactDotProduct]]. */
case class ExactSumSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    ExactNumeric.sumSqOrNull(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("ssq")
      s"""
         |java.lang.Double $tmp = graft.functions.ExactNumeric.sumSqOrNull($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ExactSumSq =
    copy(child = newChild)
}
