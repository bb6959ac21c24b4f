package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier leg of the curation
  * stack (CCNet / GPT-3 / Gopher train a fastText-style classifier on
  * "trusted vs crawl" weak labels and keep documents the model likes).
  * Here the model is a multinomial Naive Bayes over word counts with
  * add-one smoothing: deterministic, integer-count based, and exactly
  * reproducible by the DuckDB oracle — the engine side demonstrates
  * the TRAIN + BROADCAST-SCORE join shape of classifier filtering with
  * an exactly-checkable model, the same trade `LanguageModel` makes
  * against KenLM.
  *
  * Scale shape at 100 TB: training is ONE groupBy over exploded
  * (token, label) pairs — map-side combine collapses each document's
  * repeats before the exchange; the model is |V| rows. Scoring joins
  * the candidate corpus' exploded tokens against the per-token
  * log-likelihood-ratio frame (broadcast when |V| fits, shuffle on
  * token otherwise) and folds one per-document sum. Class totals,
  * vocabulary size, and priors stay in-plan as 1-row broadcast
  * frames; nothing touches the driver.
  */
object QualityClassifier {

  /** Train: per-token class counts `(token, c_pos, c_neg)` from a
    * weak-labeled corpus. The label column is any boolean expression
    * over the input (source allowlist, langid, a heuristic gate) —
    * weak labels are corpus policy, not the trainer's. */
  def trainNaiveBayes(df: DataFrame, text: Column, label: Column): DataFrame =
    df.select(label.as("__pos"), explode(split(text, " ")).as("token"))
      .groupBy("token")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("c_neg"))

  /** The class-prior frame: 1 row, `(p_docs, n_docs)` document counts
    * per class over the weak-labeled corpus — stays in-plan so the
    * prior never becomes a driver-side constant. */
  def docPriors(df: DataFrame, label: Column): DataFrame =
    df.agg(sum(when(label, 1L).otherwise(0L)).as("p_docs"),
      sum(when(!label, 1L).otherwise(0L)).as("n_docs"))

  /** Score every document under a trained model:
    * `(doc_id, n_tokens, nb_llr, nb_label)` — nb_llr is the summed
    * log-likelihood ratio Σ log P(w|+)/P(w|−) + log P(+)/P(−) under
    * add-one smoothing (6dp), nb_label its sign. `priors` is the
    * `docPriors` frame. Tokens the model never saw fall back to the
    * smoothing-only ratio via the left join's coalesce, so
    * out-of-vocabulary text degrades gracefully instead of erroring —
    * the property that matters when the scored corpus is 1000× the
    * labeled slice. */
  def scoreNaiveBayes(docs: DataFrame, text: Column, id: Column,
                      model: DataFrame, priors: DataFrame): DataFrame = {
    val totals = model.agg(
      sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"),
      count(lit(1)).as("vsz"))
    val perToken = docs
      .select(id.as("doc_id"), explode(split(text, " ")).as("token"))
      .join(model, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (log(coalesce(col("c_pos"), lit(0L)) + lit(1.0))
          - log(col("t_pos") + col("vsz"))
          - log(coalesce(col("c_neg"), lit(0L)) + lit(1.0))
          + log(col("t_neg") + col("vsz"))).as("llr"))
    docs.select(id.as("doc_id"))
      .join(perToken.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("llr")).as("sum_llr")),
        Seq("doc_id"), "left")
      .crossJoin(broadcast(priors))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("sum_llr"), lit(0.0))
          + log(col("p_docs")) - log(col("n_docs")), 6).as("nb_llr"),
        (coalesce(col("sum_llr"), lit(0.0))
          + log(col("p_docs")) - log(col("n_docs")) > 0).as("nb_label"))
  }
}
