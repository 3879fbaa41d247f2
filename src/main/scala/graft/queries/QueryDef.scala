package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle
  * text the driver hash-compares against. `oracle = None` → the driver
  * records a weaker rows-only check (used for sketches, ML scoring,
  * streaming). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def queriesOf(qs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  def oraclesOf(qs: Seq[QueryDef]): Map[String, String] =
    qs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
