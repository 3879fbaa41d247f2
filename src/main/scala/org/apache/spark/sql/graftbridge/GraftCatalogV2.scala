package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.{CatalogV2Util, Column}
import org.apache.spark.sql.types.StructType

/** v2 Column[] ⇄ StructType bridge for graft's staging catalog.
  * Spark 4 scopes CatalogV2Util private[sql]; the bridge forwards to
  * the public-bytecode conversion (which round-trips default-value
  * and comment metadata) and adds nothing else. */
object GraftCatalogV2 {
  def toStructType(columns: Array[Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(columns)
}
