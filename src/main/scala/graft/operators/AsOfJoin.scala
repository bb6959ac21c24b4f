package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for every left row, attach the most recent right
  * row of the same key with rightTime <= leftTime (the canonical
  * time-series enrichment join — trades, quotes; events, state).
  *
  * Spark has no built-in as-of join; the scalable composition is the
  * merge-by-union technique: tag both inputs, union them, and take a
  * running `last_value(..., ignoreNulls)` over (key, time, tag) — one
  * shuffle on the key, one in-partition sort, no row explosion. At
  * equal timestamps the right row sorts first (tag 0 < 1), giving
  * inclusive `>=` semantics, matching DuckDB's ASOF JOIN (the oracle).
  */
object AsOfJoin {

  /** @param valueCol single right-side payload column to carry
    *                 (generalizes to a struct for multiple). */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, valueCol: String,
               outName: String): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_tag", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
    // single select: valueCol may BE the time column, so project both
    // before any rename drops it
    val r = right.select(col(key), col(rightTime).as("_t"),
      lit(0).as("_tag"), col(valueCol).as("_rv"))
    val unioned = l.select((left.columns.map(col) :+ col("_t") :+ col("_tag") :+ col("_rv")): _*)
      .unionByName(r.select((left.columns.map(c => if (c == key) col(c) else lit(null).as(c)))
        :+ col("_t") :+ col("_tag") :+ col("_rv"): _*))
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outName, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_t", "_tag", "_rv")
  }
}
