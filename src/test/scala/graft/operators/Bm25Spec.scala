package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 ranking semantics: self-retrieval anchors rank 1, rare terms
  * outweigh common ones, ties break to the lower doc_id, k bounds
  * the result. */
class Bm25Spec extends SparkSpec {

  private def run(corpus: Seq[(Long, String)], qIds: Seq[Long], k: Int) = {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    Rag.bm25TopK(df, col("text"), col("doc_id"),
        df.filter(col("doc_id").isin(qIds: _*)), col("text"), col("doc_id"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("query doc retrieves itself first; identical twin ties to the lower id") {
    val rows = run(Seq(
      0L -> "apple banana cherry",
      1L -> "apple banana cherry",
      2L -> "apple xyz qqq",
      3L -> "zzz yyy xxx"), Seq(0L), k = 5)
    val hits = rows.map(_._3)
    assert(hits.take(2).toSeq == Seq(0L, 1L),
      s"identical docs must rank by id: $hits")
    assert(hits.contains(2L) && !hits.contains(3L),
      "term overlap gates membership: doc 3 shares nothing")
    val scores = rows.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"scores must be non-increasing down the ranking: ${scores.toSeq}")
    assert(scores(0) == scores(1), "identical text, identical score")
  }

  test("a shared rare term outweighs a shared common term") {
    val common = (10L to 29L).map(i => i -> s"common filler$i pad$i")
    val rows = run(common ++ Seq(
      0L -> "common rareterm",
      5L -> "rareterm other other2"), Seq(0L), k = 3)
    val hits = rows.map(_._3)
    assert(hits.head == 0L)
    assert(hits(1) == 5L,
      s"the rareterm doc must beat all 20 common-only docs: $hits")
  }

  test("k bounds each query's result") {
    val corpus = (0L to 20L).map(i => i -> "shared token stream")
    val rows = run(corpus, Seq(0L, 1L), k = 4)
    assert(rows.count(_._1 == 0L) == 4 && rows.count(_._1 == 1L) == 4)
    assert(rows.filter(_._1 == 0L).map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
