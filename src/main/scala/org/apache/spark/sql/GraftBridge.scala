package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so the engine
  * can materialize DataFrames from its own logical nodes
  * (GreedyAllocationNode). Spark offers no public API for this; the
  * in-package object is the standard library-extension technique. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
