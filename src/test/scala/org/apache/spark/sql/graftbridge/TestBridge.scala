package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Test-only bridge into private[spark] listener internals: lets specs
  * drain the async listener bus before asserting on job counts. */
object TestBridge {
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
