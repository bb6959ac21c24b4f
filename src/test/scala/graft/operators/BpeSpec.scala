package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training: merge order, tie-breaks, greedy run pairing,
  * early stop, encoding. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def merges(docs: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(docs.toDF("text"), col("text"), n)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("merges follow frequency with (count, lhs, rhs) tie-break and stop early") {
    // corpus = "ab" x3: pairs (a,b) and (b,</w>) both count 3 —
    // tie breaks to the greater lhs → (b,</w>) first
    val out = merges(Seq("ab ab ab"), 5)
    assert(out == Seq(
      (1, "b", "</w>", 3L),
      (2, "a", "b</w>", 3L)))
    // after 2 merges every word is one symbol: loop stops at 2, not 5
  }

  test("runs pair greedily left-to-right") {
    // "aaaa": (a,a) appears at 3 positions → count 3; apply merges
    // positions 1-2 and 3-4, NOT the overlapping middle pair
    val out = merges(Seq("aaaa"), 3)
    assert(out == Seq(
      (1, "a", "a", 3L),
      (2, "aa", "aa", 1L),
      (3, "aaaa", "</w>", 1L)))
  }

  test("frequency weighting: the common word's pair wins") {
    // "lo" x5 dominates "hi" x2
    val out = merges(Seq(("lo " * 5).trim, ("hi " * 2).trim), 1)
    assert(out == Seq((1, "o", "</w>", 5L)))
  }

  test("encoding reflects the learned merges") {
    val enc = Bpe.encodeWords(Seq("ab ab ab abc").toDF("text"), col("text"), 2)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // merges learned on {ab:3, abc:1}: (a,b) count 4 → (ab,</w>) 3
    assert(enc("ab") == "ab</w>")
    assert(enc("abc") == "ab c </w>")
  }

  test("document encode joins the vocab encodings in word order") {
    val docs = Seq((1L, "ab ab ab abc"), (2L, "abc ab")).toDF("doc_id", "text")
    val out = Bpe.encodeDocs(docs, col("doc_id"), col("text"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    // per-word encodings from the test above, concatenated in doc order
    assert(out(1L) == ((6, "ab</w> ab</w> ab</w> ab c </w>")))
    assert(out(2L) == ((4, "ab c </w> ab</w>")))
  }
}
