package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column null counts, min/max, and
  * exact distinct cardinality in a single aggregation pass (one scan
  * of the table regardless of how many columns are profiled — the
  * shape that matters when the table is 100 TB). Output is one row
  * per profiled column, unpivoted for stable schemas. */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        countDistinct(col(c)).as(s"${c}__distinct"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c =>
      s"'$c', ${c}__nonnull, ${c}__min, ${c}__max, ${c}__distinct").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stack) as (col_name, nonnull_cnt, min_val, max_val, distinct_cnt)")
  }

  /** ZERO-COST observability: attach row/null counters to a frame via
    * the Observation API — the metrics ride the frame's own action
    * (accumulator-style, no second scan, no extra shuffle), exactly
    * what a 100 TB pipeline stage wants instead of a `.count()` audit
    * pass that doubles the read. Returns the frame plus the handle;
    * call `observation.get` after any action on the frame. */
  def observed(df: DataFrame, cols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val metrics = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
