package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring span dedup: the duplicated-window detection and the
  * gaps-and-islands merge, pinned on hand-checkable corpora. */
class RepeatedSpansSpec extends SparkSpec {

  private def spans(texts: (Long, String)*): Map[Long, Seq[(Long, Long, Long, Long)]] = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    Dedup.repeatedSpans(df, col("text"), col("doc_id"), 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // docs share "a b c d e": doc 1 windows at pos 1,2 both duplicated
    // and overlapping -> one span covering words 1..5
    val out = spans(
      1L -> "a b c d e f g h",
      2L -> "x x a b c d e y")
    assert(out(1L) == Seq((1L, 5L, 5L, 2L)))
    assert(out(2L) == Seq((3L, 7L, 5L, 2L)))
  }

  test("non-overlapping duplicated windows stay separate spans") {
    // doc 1's dup windows start at pos 1 and pos 5: 5 >= 1 + k so the
    // island breaks — adjacent-but-not-overlapping regions don't merge
    val out = spans(
      1L -> "p q r s t u v w",
      2L -> "p q r s",
      3L -> "t u v w")
    assert(out(1L) == Seq((1L, 4L, 4L, 1L), (5L, 8L, 4L, 1L)))
    assert(out(2L) == Seq((1L, 4L, 4L, 1L)))
    assert(out(3L) == Seq((1L, 4L, 4L, 1L)))
  }

  test("identical documents are one whole-document span each") {
    val out = spans(1L -> "m n o p q r", 2L -> "m n o p q r")
    assert(out(1L) == Seq((1L, 6L, 6L, 3L)))
    assert(out(2L) == Seq((1L, 6L, 6L, 3L)))
  }

  test("a within-document repeat duplicates its own windows") {
    // "a b c d" occurs twice inside one doc: both occurrences flagged,
    // no other corpus member needed
    val out = spans(1L -> "a b c d z z z a b c d")
    assert(out(1L) == Seq((1L, 4L, 4L, 1L), (8L, 11L, 4L, 1L)))
  }

  test("an all-unique corpus and short documents produce no spans") {
    val out = spans(
      1L -> "one two three four five",
      2L -> "six seven eight nine ten",
      3L -> "a b c") // shorter than k: zero windows
    assert(out.isEmpty)
  }

  private def trim(texts: (Long, String)*): Map[Long, (String, Long)] = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    Dedup.trimRepeatedSpans(df, col("text"), col("doc_id"), 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
  }

  test("trim drops exactly the in-span words and keeps the rest in order") {
    val out = trim(
      1L -> "a b c d e f g h",
      2L -> "x x a b c d e y")
    assert(out(1L) == (("f g h", 5L)))
    assert(out(2L) == (("x x y", 5L)))
  }

  test("a fully-duplicated document survives as an empty row") {
    val out = trim(1L -> "m n o p q r", 2L -> "m n o p q r")
    assert(out(1L) == (("", 6L)))
    assert(out(2L) == (("", 6L)))
  }

  test("an all-unique corpus trims nothing") {
    val out = trim(
      1L -> "one two three four five",
      2L -> "six seven eight nine ten")
    assert(out(1L) == (("one two three four five", 0L)))
    assert(out(2L) == (("six seven eight nine ten", 0L)))
  }
}
