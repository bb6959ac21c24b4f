package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Naive Bayes quality classifier: sign separation on separable
  * vocab, OOV fallback, hand-computed score. */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  // two positive docs speak "good", two negative speak "spam";
  // t_pos = 8, t_neg = 8, V = 9, priors 2/2
  private val corpus = Seq(
    (1L, "good clean prose here", true),
    (2L, "good solid clean writing", true),
    (3L, "spam spam buy now", false),
    (4L, "buy spam now now", false))

  private def train() = {
    val df = corpus.toDF("doc_id", "text", "pos")
    (QualityClassifier.trainNaiveBayes(df, col("text"), col("pos")),
      QualityClassifier.docPriors(df, col("pos")))
  }

  private def score(docs: Seq[(Long, String)]) = {
    val (model, priors) = train()
    QualityClassifier.scoreNaiveBayes(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"), model, priors)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
  }

  test("separable vocabulary separates by sign") {
    val out = score(corpus.map(t => (t._1, t._2)))
    assert(out(1L)._3 && out(2L)._3, "positive docs must score positive")
    assert(!out(3L)._3 && !out(4L)._3, "negative docs must score negative")
    assert(out.values.forall(_._1 > 0))
  }

  test("an all-OOV document falls back to smoothing-only ratios") {
    val out = score(Seq(9L -> "zz yy"))
    val (n, llr, label) = out(9L)
    assert(n == 2L)
    // each unseen token contributes ln(1/(8+9)) − ln(1/(8+9)) = 0 and
    // the priors are balanced — the score is exactly zero, label false
    assert(math.abs(llr) < 1e-9 && !label)
  }

  test("scores match the closed-form Naive Bayes by hand") {
    val out = score(corpus.map(t => (t._1, t._2)))
    // doc 3 = "spam spam buy now": counts spam(0,3) buy(0,2) now(0,3)
    def lp(cPos: Long, cNeg: Long): Double =
      math.log((cPos + 1.0) / (8 + 9)) - math.log((cNeg + 1.0) / (8 + 9))
    val want = 2 * lp(0, 3) + lp(0, 2) + lp(0, 3) // prior ln(2/2) = 0
    assert(math.abs(out(3L)._2 - BigDecimal(want).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6,
      s"${out(3L)._2} vs $want")
  }
}
