package graft

import org.apache.spark.sql.types._

/** Guard for the driver gate's output contract: the correctness
  * harness canonicalizes results with a pandas sort/hash that only
  * handles scalar cells, so EVERY query in `SparkEntry.queries` must
  * emit atomic-only top-level columns. Array/map/struct/binary
  * payloads stay internal — project them to scalars (digests, exact
  * checksums, exploded rows) before output.
  *
  * This contract regression cost round 7 two gate rows (q_centroids /
  * q_quantize8 emitted raw ARRAY columns and crashed the comparator
  * with "unhashable numpy.ndarray"); this spec makes a recurrence a
  * local test failure instead of a judged round failure.
  */
class OutputContractSpec extends SparkSpec {

  private def nonAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => true
    case _ => false
  }

  test("every SparkEntry query emits atomic-only top-level columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        val bad = build(spark, Sf0001).schema.fields.filter(f => nonAtomic(f.dataType))
        if (bad.isEmpty) None
        else Some(name + ": " + bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
    assert(offenders.isEmpty,
      "non-scalar output columns would crash the driver comparator:\n" +
        offenders.mkString("\n"))
  }

  test("the guard itself rejects a non-atomic schema (self-test)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(array(lit(1), lit(2)).as("a"))
    assert(df.schema.fields.exists(f => nonAtomic(f.dataType)),
      "guard predicate must flag ArrayType")
  }
}
