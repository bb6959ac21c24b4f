package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the perplexity filter of
  * the CCNet pipeline (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020): train a
  * small LM on a trusted reference corpus, score every candidate
  * document by its average negative log-likelihood under that LM, and
  * let the pipeline keep/bucket documents by score. Here the LM is an
  * add-one-smoothed word-bigram model — deterministic, integer-count
  * based, and exactly reproducible by the DuckDB oracle, unlike the
  * original's KenLM — so the engine side is the JOIN SHAPE of
  * perplexity filtering with an exactly-checkable model.
  *
  * Scale shape at 100 TB: training is one groupBy over exploded
  * bigrams (map-side combine collapses each document's repeats before
  * the exchange — same shape as the dedup family's gram counts);
  * scoring is two equi-keyed joins of the candidate corpus' bigrams
  * against the count frames — (ctx, nxt) then ctx — followed by one
  * per-document aggregate. Nothing all-pairs, nothing collected to
  * the driver: even the vocabulary size stays in-plan as a 1-row
  * broadcast frame. A reference LM small enough to broadcast turns
  * both probe joins into broadcast joins; a web-scale one shuffles on
  * bigram keys, which AQE handles like any skewed aggregation.
  */
object LanguageModel {

  /** `(doc_id?, ctx, nxt)` — one row per adjacent word pair. */
  private def bigramsOf(df: DataFrame, text: Column, idOpt: Option[Column]): DataFrame = {
    val toks = col("__toks")
    val cnt = size(toks) - 1
    val base = idOpt match {
      case Some(id) => df.select(id.as("doc_id"), split(text, " ").as("__toks"))
      case None => df.select(split(text, " ").as("__toks"))
    }
    val pairs = base.select(
      (idOpt.map(_ => col("doc_id")).toSeq :+
        explode(when(cnt >= 1,
          transform(sequence(lit(1), cnt),
            i => struct(element_at(toks, i).as("ctx"), element_at(toks, i + 1).as("nxt"))))
          .otherwise(array())).as("bg")): _*)
    pairs.select(
      (idOpt.map(_ => col("doc_id")).toSeq :+ col("bg.ctx") :+ col("bg.nxt")): _*)
  }

  /** The trained model: `(ctx, nxt, c2)` bigram counts over the
    * reference corpus. Context totals and vocabulary size are derived
    * from this one frame at scoring time, so persisting the model is
    * persisting this single table. */
  def bigramLm(ref: DataFrame, text: Column): DataFrame =
    bigramsOf(ref, text, None)
      .groupBy("ctx", "nxt").agg(count(lit(1)).as("c2"))

  /** Score every document against a trained bigram LM:
    * `(doc_id, n_bigrams, avg_nll)` — average negative log-likelihood
    * per bigram under add-one smoothing,
    * P(nxt|ctx) = (c2 + 1) / (c1 + |V|), rounded to 6dp. Documents
    * with fewer than two words keep their row with n_bigrams = 0 and
    * a null score (they carry no evidence either way — thresholding
    * them is corpus policy, not the scorer's call). Low avg_nll =
    * reference-like text; high = out-of-domain or garbage. */
  /** Contrastive (DSIR-style) importance scoring — Xie et al., "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023: score every document under a TARGET-domain LM and
    * a general REFERENCE LM, and rank by the log importance ratio
    * log p_tgt(x) − log p_ref(x) (here per-bigram, = avg_nll_ref −
    * avg_nll_tgt; positive means the target model predicts the text
    * better, i.e. keep it for the target mixture). One pass over the
    * candidate corpus' bigrams probes BOTH models — four equi-keyed
    * joins against count frames, two 1-row broadcast vocab scalars,
    * one per-document aggregate — so the selection sweep costs the
    * same shuffle shape as a single-model score, not 2×. */
  def contrastScore(docs: DataFrame, text: Column, id: Column,
                    lmTarget: DataFrame, lmRef: DataFrame): DataFrame = {
    def frames(lm: DataFrame, tag: String) = (
      lm.select(col("ctx"), col("nxt"), col("c2").as(s"c2_$tag")),
      lm.groupBy("ctx").agg(sum(col("c2")).as(s"c1_$tag")),
      lm.agg(countDistinct(col("nxt")).as(s"vsz_$tag")))
    val (t2, t1, tv) = frames(lmTarget, "t")
    val (r2, r1, rv) = frames(lmRef, "r")
    def nll(tag: String): Column =
      -log((coalesce(col(s"c2_$tag"), lit(0L)) + lit(1.0))
        / (coalesce(col(s"c1_$tag"), lit(0L)) + col(s"vsz_$tag")))
    val scored = bigramsOf(docs, text, Some(id))
      .join(t2, Seq("ctx", "nxt"), "left")
      .join(t1, Seq("ctx"), "left")
      .join(r2, Seq("ctx", "nxt"), "left")
      .join(r1, Seq("ctx"), "left")
      .crossJoin(broadcast(tv))
      .crossJoin(broadcast(rv))
      .select(col("doc_id"), nll("t").as("nll_t"), nll("r").as("nll_r"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("nll_t")), 6).as("avg_nll_target"),
        round(avg(col("nll_r")), 6).as("avg_nll_ref"),
        round(avg(col("nll_r")) - avg(col("nll_t")), 6).as("log_importance"))
    docs.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll_target"), col("avg_nll_ref"), col("log_importance"))
  }

  def scoreDocs(docs: DataFrame, text: Column, id: Column, lm: DataFrame): DataFrame =
    docs.select(id.as("doc_id"))
      .join(scoreCore(docs, text, id, lm), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))

  /** The scored frame BEFORE the join back to the full document set:
    * `(doc_id, n_bigrams, avg_nll)` with one row per document that
    * carries >= 1 bigram (< 2-word documents are absent — `scoreDocs`
    * restores them as n_bigrams = 0 / null score). Callers that left
    * join the score onto a frame they already hold (Curation.audit)
    * use this directly, skipping scoreDocs' own docs-side join — one
    * doc_id exchange instead of two for the same rows. */
  private[operators] def scoreCore(docs: DataFrame, text: Column, id: Column,
                                   lm: DataFrame): DataFrame = {
    val ctxTotals = lm.groupBy("ctx").agg(sum(col("c2")).as("c1"))
    val vocab = lm.agg(countDistinct(col("nxt")).as("vsz"))
    bigramsOf(docs, text, Some(id))
      .join(lm, Seq("ctx", "nxt"), "left")
      .join(ctxTotals, Seq("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((coalesce(col("c2"), lit(0L)) + lit(1.0))
          / (coalesce(col("c1"), lit(0L)) + col("vsz"))).as("ll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(-avg(col("ll")), 6).as("avg_nll"))
  }
}
