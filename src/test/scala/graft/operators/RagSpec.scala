package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RAG plumbing: embedding shape/determinism, chunk-key packing, and
  * the planted-retrieval property — a query that IS a document's text
  * must retrieve that document's chunks first. */
class RagSpec extends SparkSpec {

  import spark.implicits._

  private def mkDoc(id: Long, words: Seq[String], reps: Int): (Long, String) =
    (id, Seq.fill(reps)(words).flatten.mkString(" "))

  private def corpus() = Seq(
    mkDoc(0L, Seq("alpha", "beta", "gamma", "delta"), 40),
    mkDoc(1L, Seq("epsilon", "zeta", "eta", "theta"), 40),
    mkDoc(2L, Seq("iota", "kappa", "lambda", "mu"), 40)
  ).toDF("doc_id", "text")

  test("hashEmbed: fixed width, integer-valued dims, deterministic") {
    val e = Rag.hashEmbed(corpus(), col("text"), col("doc_id"))
    val rows = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(rows.length == 3)
    assert(rows.forall(_._2.length == Similarity.lshDims))
    // counts are integers; a 160-token doc has total |mass| 160
    rows.foreach { case (_, v) =>
      assert(v.forall(x => x == math.round(x).toFloat))
      assert(v.map(math.abs(_)).sum == 160.0f)
    }
    val again = Rag.hashEmbed(corpus(), col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSet
    assert(again == rows.map(r => (r._1, r._2.toSeq)).toSet)
  }

  test("chunk keys pack and decode without collision") {
    val idx = Rag.chunkIndex(corpus(), col("text"), col("doc_id"),
      chunkTokens = 64, overlapTokens = 16)
    val keys = idx.select("vec_id").collect().map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    // 160 tokens, window 64, stride 48 → 3 chunks per doc
    assert(keys.length == 9)
    assert(keys.forall(k => k / Rag.chunkKeyBase < 3 && k % Rag.chunkKeyBase < 3))
  }

  test("a document used as the query retrieves its own chunks") {
    val idx = Rag.chunkIndex(corpus(), col("text"), col("doc_id"),
      chunkTokens = 64, overlapTokens = 16)
    val out = Rag.retrieve(idx, corpus(), col("text"), col("doc_id"), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    // every query finds neighbors, and every retrieved chunk at every
    // rank comes from the query's own document (disjoint vocabularies
    // → cosine 1 to own chunks, bucket-separated from the others)
    assert(out.nonEmpty)
    assert(out.forall { case (q, src, _, _) => q == src },
      s"cross-document retrieval on disjoint vocabularies: ${out.toSeq}")
    val perQuery = out.groupBy(_._1)
    assert(perQuery.keySet == Set(0L, 1L, 2L))
    perQuery.values.foreach(rs => assert(rs.length == 3))
  }
}
