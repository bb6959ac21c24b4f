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

  test("hashEmbed kernel is bit-equal to the exploded reference (edge cases + fuzz)") {
    // the tokenization edges the kernel's byte walk must reproduce,
    // plus seeded-random multi-byte docs
    val rng = new scala.util.Random(7)
    val alphabet = Vector("α", "ß", "日", "a", "bb", "ccc", "Z", "émü", "x9", "")
    val gnarly = Seq(
      (0L, "alpha beta gamma"), (1L, ""), (2L, " leading"), (3L, "trailing "),
      (4L, "two  spaces"), (5L, "solo"), (6L, "über café naïve"),
      (7L, null.asInstanceOf[String]), (8L, "   ")) ++
      (9L until 150L).map { i =>
        (i, (0 until rng.nextInt(25))
          .map(_ => alphabet(rng.nextInt(alphabet.size)))
          .mkString(if (rng.nextBoolean()) " " else "  "))
      }
    val df = gnarly.toDF("doc_id", "text")
    def m(e: org.apache.spark.sql.DataFrame) =
      e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val kernel = m(Rag.hashEmbed(df, col("text"), col("doc_id")))
    val exploded = m(Rag.hashEmbedExploded(df, col("text"), col("doc_id")))
    assert(kernel == exploded)
    assert(!kernel.contains(7L), "a null text yields no embedding row on either path")
    assert(kernel.contains(1L), "an empty text embeds its one empty token")
  }

  test("hashEmbed is a shuffle-free projection (no explode, no exchange)") {
    val dir = java.nio.file.Files.createTempDirectory("rag_plan").toString
    corpus().write.mode("overwrite").parquet(dir)
    val plan = Rag.hashEmbed(spark.read.parquet(dir), col("text"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_hash_embed"), plan)
    assert(!plan.contains("Generate explode"), s"token explode resurfaced:\n$plan")
    assert(!plan.contains("Exchange"), s"embed pass shuffles:\n$plan")
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
