package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each point to the
  * intervals that contain it. Spark plans a raw
  * `p BETWEEN s AND e` predicate as a broadcast-nested-loop join —
  * O(|points|·|intervals|). The scalable form bins time: each
  * interval replicates to the bins it covers, each point maps to its
  * bin, the join becomes an equi-join on (key, bin) and the exact
  * BETWEEN predicate refines survivors. Replication factor =
  * interval length / binWidth, so pick binWidth near the typical
  * interval length.
  */
object RangeJoin {

  /** @param key   equality column present on both sides
    * @param point  left time column, `start`/`end` right interval
    *               columns (inclusive), all integral */
  def binned(points: DataFrame, intervals: DataFrame, key: String,
             point: String, start: String, end: String,
             binWidth: Long): DataFrame = {
    val p = points.withColumn("_bin", (col(point) / binWidth).cast("long"))
    val i = intervals.withColumn("_bin",
      explode(sequence((col(start) / binWidth).cast("long"),
                       (col(end) / binWidth).cast("long"))))
    p.join(i, Seq(key, "_bin"))
      .filter(col(point) >= col(start) && col(point) <= col(end))
      .drop("_bin")
  }
}
