package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Add-one bigram LM scoring, pinned on a hand-computed fixture. */
class LanguageModelSpec extends SparkSpec {

  import spark.implicits._

  // ref bigrams: (a,b) (b,a) (a,c) + (b,a)  →  lm {ab:1, ba:2, ac:1}
  // ctx totals {a:2, b:2}; vocab |{b, a, c}| = 3
  private lazy val lm = LanguageModel.bigramLm(
    Seq("a b a c", "b a").toDF("text"), col("text"))

  test("trained counts match the hand count") {
    val m = lm.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "b") -> 1L, ("b", "a") -> 2L, ("a", "c") -> 1L))
  }

  test("scores match the closed-form add-one probabilities") {
    val out = LanguageModel.scoreDocs(
        Seq(1L -> "a b a", 2L -> "z z", 3L -> "q").toDF("doc_id", "text"),
        col("text"), col("doc_id"), lm)
      .collect().map(r => r.getLong(0) -> r).toMap

    // doc 1: P(b|a) = (1+1)/(2+3), P(a|b) = (2+1)/(2+3)
    val expected1 = -(math.log(2.0 / 5) + math.log(3.0 / 5)) / 2
    assert(out(1L).getLong(1) == 2L)
    assert(out(1L).getDouble(2) == math.rint(expected1 * 1e6) / 1e6)

    // doc 2: unseen ctx AND unseen bigram → (0+1)/(0+3)
    assert(out(2L).getLong(1) == 1L)
    assert(out(2L).getDouble(2) == math.rint(math.log(3.0) * 1e6) / 1e6)

    // doc 3: one word, no bigrams — row kept, score null
    assert(out(3L).getLong(1) == 0L)
    assert(out(3L).isNullAt(2))
  }

  test("contrastive importance matches the closed form and ranks domains") {
    // ref model trained on disjoint-vocabulary text: every probe bigram
    // is unseen → nll_r = ln 3 under add-one with |V| = 3
    val lmRef = LanguageModel.bigramLm(Seq("x y x z", "y x").toDF("text"), col("text"))
    val out = LanguageModel.contrastScore(
        Seq(1L -> "a b a", 2L -> "x y x", 3L -> "q").toDF("doc_id", "text"),
        col("text"), col("doc_id"), lm, lmRef)
      .collect().map(r => r.getLong(0) -> r).toMap

    val nllT1 = -(math.log(2.0 / 5) + math.log(3.0 / 5)) / 2
    val imp1 = math.log(3.0) - nllT1
    assert(out(1L).getDouble(4) == math.rint(imp1 * 1e6) / 1e6)
    assert(out(1L).getDouble(4) > 0) // target-like doc: keep
    assert(out(2L).getDouble(4) < 0) // ref-like doc: down-weight
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(4))
  }

  test("reference-like text scores lower nll than off-domain text") {
    val out = LanguageModel.scoreDocs(
        Seq(1L -> "a b a c", 2L -> "x y z w").toDF("doc_id", "text"),
        col("text"), col("doc_id"), lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L))
  }
}
