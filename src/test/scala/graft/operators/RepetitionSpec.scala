package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals, pinned on hand-computed fixtures. */
class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def signals(rows: (Long, String)*): Map[Long, Seq[Double]] =
    TextAnalysis.repetitionSignals(rows.toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getDouble))
      .toMap

  test("top-n-gram fractions match the hand count on equal-length ties") {
    // "a b a b c": chars 5; 2-grams {a b: 2, b a: 1, b c: 1} → 2·2/5
    // 3-grams all unique (equal chars → any winner, same value) → 1·3/5
    // 4-grams {a b a b, b a b c} equal chars → 1·4/5; no dup 5/10-grams
    val out = signals(1L -> "a b a b c")
    assert(out(1L) == Seq(0.8, 0.6, 0.8, 0.0, 0.0))
  }

  test("count ties with unequal char sums break to the LONGEST gram") {
    // "zz a zz a bbb c bbb c": chars 14; 2-gram counts: {zz a: 2,
    // bbb c: 2, a zz: 1, a bbb: 1, c bbb: 1} — cnt tie between
    // "zz a" (3 chars) and "bbb c" (4 chars) → longest wins → 2·4/14
    val out = signals(9L -> "zz a zz a bbb c bbb c")
    assert(out(9L).head == round6(8.0 / 14))
  }

  test("dup-n-gram coverage merges overlapping occurrences") {
    // "x y z x y z x y": chars 8; "x y z x y" occurs at pos 1 and 4 →
    // covered 1..5 ∪ 4..8 = all 8 positions → dup5 = 1.0
    // top2 "x y"×3 → 6/8; top3 tie at 2 → "z x y" → 6/8;
    // top4 {x y z x: 2, y z x y: 2} → "y z x y" → 8/8; len<10 → dup10 0
    val out = signals(2L -> "x y z x y z x y")
    assert(out(2L) == Seq(0.75, 0.75, 1.0, 1.0, 0.0))
  }

  test("documents shorter than the window emit zero, not a dropped row") {
    val out = signals(3L -> "q", 4L -> "q r s")
    assert(out(3L) == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    // "q r s": top2 tie {q r, r s} → "r s" → 1·2/3; top3 → 1·3/3
    assert(out(4L) == Seq(round6(2.0 / 3), 1.0, 0.0, 0.0, 0.0))
  }

  test("a self-repeating document saturates while prose stays low") {
    val spam = (1 to 20).map(_ => "buy now").mkString(" ")
    val prose = "the quick brown fox jumps over the lazy dog again today"
    val out = signals(5L -> spam, 6L -> prose)
    assert(out(5L)(3) == 1.0)          // dup-5-gram coverage: everything
    assert(out(5L).head > 0.9)         // top-2-gram claims ~all chars
    assert(out(6L)(3) == 0.0 && out(6L).head < 0.3)
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
}
