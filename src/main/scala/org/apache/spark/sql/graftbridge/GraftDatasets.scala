package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan → DataFrame bridge for graft's custom logical nodes.
  * Spark 4 scopes Dataset.ofRows private[sql], so the (standard
  * extension-library) bridge lives under the sql package; it forwards
  * to the public-bytecode API and adds nothing else. */
object GraftDatasets {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
