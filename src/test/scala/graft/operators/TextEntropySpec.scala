package graft.operators

import graft.SparkSpec
import graft.plans.TextEntropy
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** TextEntropy kernel laws: the single-pass struct must equal the
  * explode-then-aggregate definition, term for term. */
class TextEntropySpec extends SparkSpec {

  private def ref(symbols: Seq[String]): (Long, Long, Long) = {
    val n = symbols.length.toLong
    val grouped = symbols.groupBy(identity).view.mapValues(_.length.toLong)
    val eu = grouped.values.map { k =>
      val p = k * 1.0 / n
      Math.round(-p * Math.log(p) * 1000000.0)
    }.sum
    (n, grouped.size.toLong, eu)
  }

  test("kernel equals the per-symbol definitional computation") {
    val cases = Seq("abcd", "aaaa", "a  b", "the quick brown fox the",
      "x", "ab ab ab cd")
    cases.foreach { s =>
      val chRef = ref(s.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp))))
      val tkRef = ref(s.split(" ", -1).toSeq)
      val ch = TextEntropy.compute(UTF8String.fromString(s), "")
      val tk = TextEntropy.compute(UTF8String.fromString(s), " ")
      assert((ch.getLong(0), ch.getLong(1), ch.getLong(2)) == chRef, s"char: '$s'")
      assert((tk.getLong(0), tk.getLong(1), tk.getLong(2)) == tkRef, s"token: '$s'")
    }
  }

  test("codegen path through a DataFrame matches the definitional reference") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcd"),
      (1L, "aaaa aaaa aaaa"),
      (2L, "mixed bag of words mixed bag"),
      (3L, "a  b")).toDF("doc_id", "text")
    val out = TextAnalysis.entropySignals(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // uniform 4-symbol alphabet: 4 equal micro-nat terms
    val t = Math.round(-(0.25 * Math.log(0.25)) * 1000000.0)
    assert(out(0L).getDouble(3) == 4 * t / 1e6)
    assert(out(0L).getLong(2) == 4L) // distinct chars
    // one repeated token → token entropy 0, but chars still mix
    assert(out(1L).getDouble(6) == 0.0)
    assert(out(1L).getLong(5) == 1L)
    // consecutive delimiters keep the empty token (split -1 semantics)
    assert(out(3L).getLong(4) == 3L && out(3L).getLong(5) == 3L)
  }

  test("surrogate pairs count as one code point") {
    val r = TextEntropy.compute(UTF8String.fromString("𝄞a"), "")
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
  }
}
