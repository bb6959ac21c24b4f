package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-document paragraph dedup: keep-first globally, reassembly
  * order, full-loss accounting, within-doc repeats. */
class ParagraphDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] =
    Dedup.paragraphDedup(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"), w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a shared paragraph survives only in the earliest document") {
    // width 2: doc 1 = [a b][c d], doc 2 = [a b][x y] — "a b" kept in 1
    val out = run(Seq(1L -> "a b c d", 2L -> "a b x y"), 2)
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 1L, "x y")))
  }

  test("a fully-duplicated document survives as an empty string") {
    val out = run(Seq(1L -> "a b c d", 2L -> "a b c d"), 2)
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 0L, "")))
  }

  test("keep-first is by (doc, paragraph index), not arrival order") {
    // the same paragraph appears twice WITHIN doc 1 — only the
    // first index survives, and doc 2's copy loses to it
    val out = run(Seq(1L -> "a b a b", 2L -> "a b z z"), 2)
    assert(out(1L) == ((2L, 1L, "a b")))
    assert(out(2L) == ((2L, 1L, "z z")))
  }

  test("reassembly preserves original paragraph order") {
    // doc 2 loses its MIDDLE paragraph; flanks re-join in order
    val out = run(Seq(1L -> "m m", 2L -> "p q m m r s"), 2)
    assert(out(2L) == ((3L, 2L, "p q r s")))
  }

  test("tail paragraphs shorter than the width still dedup") {
    // width 4: doc 1 tail [e f] == doc 2's whole text
    val out = run(Seq(1L -> "a b c d e f", 2L -> "e f"), 4)
    assert(out(1L) == ((2L, 2L, "a b c d e f")))
    assert(out(2L) == ((1L, 0L, "")))
  }

  test("paragraph counts match the chunker's segmentation") {
    val docs = Seq(1L -> "a", 2L -> ("t " * 16).trim, 3L -> ("t " * 17).trim)
    val out = run(docs, 16)
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 2L)
  }

  private def runLines(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Dedup.paragraphDedupLines(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("MISALIGNED duplicate paragraph: the fixed grid provably misses " +
      "it, the boundary-aware form recovers it") {
    // the same verbatim paragraph "q r s t" sits at token offset 2 in
    // doc 1 and offset 3 in doc 2 — off the width-2 grid's phase in
    // exactly one of them, so the grid chunks it differently per doc
    val docs = Seq(
      1L -> "a b\n\nq r s t\n\nc d",
      2L -> "e f g\n\nq r s t")
    // grid form (width 2, newlines are just whitespace to the token
    // grid): doc 1 = [a b][q r][s t][c d], doc 2 = [e f][g q][r s][t]
    // — no chunk collides, NOTHING dedups: recall is alignment-bound
    val grid = run(docs.map { case (i, t) => i -> t.replace("\n\n", " ") }, 2)
    assert(grid(1L)._2 == 4L && grid(2L)._2 == 4L,
      s"the grid form must demonstrably miss the misaligned dup: $grid")
    // boundary form: the shared paragraph is one segment in BOTH docs
    // — doc 1 (earlier) keeps it, doc 2 loses exactly it
    val lines = runLines(docs)
    assert(lines(1L) == ((3L, 3L, "a b\n\nq r s t\n\nc d")), s"$lines")
    assert(lines(2L) == ((2L, 1L, "e f g")), s"$lines")
  }

  test("boundary form: keep-first by (doc, index), order-preserving " +
      "reassembly, full-loss accounting, empty segments ignored") {
    val docs = Seq(
      // dup WITHIN doc 3 and across docs; extra blank lines collapse
      3L -> "x y\n\n\n\nx y\n\nz",
      // every paragraph of doc 4 lost to earlier copies → ""
      4L -> "x y\n\nz",
      // first-by-doc_id: doc 3 wins both, including against itself
      5L -> "z\n\nw")
    val out = runLines(docs)
    assert(out(3L) == ((3L, 2L, "x y\n\nz")), s"$out")
    assert(out(4L) == ((2L, 0L, "")), s"$out")
    assert(out(5L) == ((2L, 1L, "w")), s"$out")
  }
}
