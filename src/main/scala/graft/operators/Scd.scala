package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: turn a change log into validity
  * intervals — the history-keeping form of the reference's stock
  * refresh (src/data_processor.py stock overwrite keeps only the
  * latest state; a warehouse that must answer "what was the price
  * when this order shipped" keeps every version instead).
  *
  * One window per key over the change sequence: valid_from = the
  * change's own timestamp, valid_to = the NEXT change's timestamp
  * (half-open [from, to)), is_current = no successor. Exactly one
  * current row per (key, attribute history); a point-in-time probe is
  * then a plain range predicate, and the as-of JOIN form is
  * AsOfJoin.leftAsOf against the interval table. Shuffles once on the
  * key — the same single-exchange shape as evSessions.
  */
object Scd {

  /** Expand a change log (`key`, `ts`, payload columns ride along)
    * into SCD2 intervals. `tieBreak` orders equal-timestamp changes
    * deterministically (last write in tie order wins the interval). */
  def type2(changes: DataFrame, key: String, ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time slice of an SCD2 table: the rows whose interval
    * covers `at` (half-open semantics: from ≤ at < to). */
  def asOf(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at
      && (col("valid_to").isNull || at < col("valid_to")))
}
