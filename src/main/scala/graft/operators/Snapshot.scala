package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-release step of a training-data
  * pipeline ("what changed between corpus v1 and v2": the audit line
  * every datasheet and every incremental re-train decision starts
  * from). Documents are compared by id and CONTENT HASH, never by
  * text equality: both sides project to `(id, md5)` before the join,
  * so diffing two 100 TB snapshots moves ~48-byte rows through one
  * id-keyed full-outer join — the text columns never leave their
  * scans. Emits one row per changed document: `status` ∈ added /
  * removed / modified (unchanged rows are suppressed — at release
  * scale they are the overwhelming bulk and carry no information).
  */
object Snapshot {

  def diff(prev: DataFrame, next: DataFrame, id: Column,
           text: Column): DataFrame = {
    def keyed(df: DataFrame, tag: String) =
      df.select(id.as("doc_id"),
        md5(text.cast("binary")).as(s"md5_$tag"))
    keyed(prev, "a").join(keyed(next, "b"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("md5_a").isNull, lit("added"))
          .when(col("md5_b").isNull, lit("removed"))
          .when(col("md5_a") =!= col("md5_b"), lit("modified")))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))
  }

  /** The release summary: per-status counts plus the carried-over
    * document count (unchanged = |prev ∩ next| − modified). */
  def diffSummary(prev: DataFrame, next: DataFrame, id: Column,
                  text: Column): DataFrame = {
    val d = diff(prev, next, id, text)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
    val totals = prev.agg(count(lit(1)).as("n_prev"))
      .crossJoin(next.agg(count(lit(1)).as("n_next")))
    d.crossJoin(broadcast(totals))
  }
}
