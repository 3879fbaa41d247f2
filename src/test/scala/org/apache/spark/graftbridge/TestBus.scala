package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge: SparkContext.listenerBus is private[spark]; the
  * shuffle-budget spec needs a deterministic flush point after an
  * action before reading listener-accumulated task metrics. Lives in
  * TEST sources — never ships with the library. */
object TestBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
