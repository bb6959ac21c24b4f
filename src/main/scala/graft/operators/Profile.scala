package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column null counts, min/max, and
  * distinct cardinality in a single scan of the table regardless of
  * how many columns are profiled — the shape that matters when the
  * table is 100 TB. Output is one row per profiled column, unpivoted
  * for stable schemas.
  *
  * Neither path plans an Expand. Multiple `countDistinct` aggregates
  * in one `agg` make Catalyst Expand the scan output once per
  * distinct column — a ×|cols| row amplification between the scan and
  * the first aggregate. The DEFAULT path uses HLL sketches
  * (`approx_count_distinct`), which partial-aggregate map-side like
  * any ordinary aggregate: the shuffle carries one sketch per column
  * per partition, the cardinalities are ±rsd. The EXACT path unpivots
  * to (col_name, value) pairs first, so there is exactly ONE distinct
  * aggregate — Catalyst plans it as a two-phase aggregation on the
  * pair key, again Expand-free, at the cost of shuffling the distinct
  * value set. Exact profiling of a 100 TB table is a real decision,
  * not a default. */
object Profile {

  /** Approximate profile (default at scale): one ordinary aggregation
    * pass, HLL distinct estimates with relative error `rsd`. */
  def numeric(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nonnull"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        approx_count_distinct(col(c), rsd).as(s"${c}__distinct"))
    }
    unpivot(df, cols, aggs)
  }

  /** Exact profile (opt-in): unpivot-first so the single `value`
    * distinct aggregate plans without Expand. Distinctness is counted
    * on the double-cast value — injective for numeric columns of ≤ 15
    * significant digits. */
  def numericExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.selectExpr(
      s"stack(${cols.size}, ${cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")})" +
        " as (col_name, value)")
    stacked.groupBy("col_name").agg(
      count(col("value")).as("nonnull_cnt"),
      round(min(col("value")), 6).as("min_val"),
      round(max(col("value")), 6).as("max_val"),
      countDistinct(col("value")).as("distinct_cnt"))
  }

  private def unpivot(df: DataFrame, cols: Seq[String],
                      aggs: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c =>
      s"'$c', ${c}__nonnull, ${c}__min, ${c}__max, ${c}__distinct").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stack) as (col_name, nonnull_cnt, min_val, max_val, distinct_cnt)")
  }

  /** Per-source data card — the transparency table a corpus release
    * ships (datasheets-for-datasets practice: per-source volume,
    * duplication, dominant language, quality/perplexity profile), so
    * a training-mixture decision can be made per source without
    * re-scanning the corpus. One row per source:
    * doc/token counts, exact-duplicate rate, dominant language
    * (deterministic argmax via max(struct)), mean top-2-gram
    * repetition, mean NLL under the trusted-slice LM.
    *
    * Composes [[TextAnalysis.repetitionSignals]] and
    * [[LanguageModel.scoreDocs]] per doc, then one source-keyed
    * aggregation — at 100 TB the signal subtrees dominate and they
    * are both doc-keyed; the final rollup is O(#sources) rows. */
  def datacard(docs: DataFrame, text: org.apache.spark.sql.Column,
               id: org.apache.spark.sql.Column, lmRef: DataFrame): DataFrame = {
    val rep = TextAnalysis.repetitionSignals(docs, text, id, Seq(2), Seq(5))
      .select(col("doc_id"), col("top_2gram_frac"))
    val lm = LanguageModel.scoreDocs(docs, text, id,
        LanguageModel.bigramLm(lmRef, text))
      .select(col("doc_id"), col("avg_nll"))
    val base = docs.select(id.as("doc_id"), col("source"), col("lang"),
      text.as("__text"), size(split(text, " ")).as("__n_toks"))
    val topLang = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(max(struct(col("c"), col("lang"))).as("t"))
      .select(col("source"), col("t.lang").as("top_lang"))
    base.join(rep, Seq("doc_id")).join(lm, Seq("doc_id"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n_toks")).as("n_tokens"),
        round(avg(col("__n_toks")), 2).as("avg_doc_tokens"),
        round((count(lit(1)) - countDistinct(col("__text"))).cast("double")
          / count(lit(1)), 6).as("exact_dup_rate"),
        round(avg(col("top_2gram_frac")), 6).as("avg_top2_frac"),
        round(avg(col("avg_nll")), 6).as("avg_nll"))
      .join(topLang, Seq("source"))
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
