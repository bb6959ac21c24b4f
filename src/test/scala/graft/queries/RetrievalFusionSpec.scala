package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Composite invariants for the round-9 audit/fusion queries, run on
  * the smoke-scale testdata the driver also reads. */
class RetrievalFusionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ds_hybrid_rrf: fused score is exactly the two-list RRF recomputation") {
    val fused = DataOps.dsHybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fused.nonEmpty)
    val perQuery = fused.groupBy(_._1)
    assert(perQuery.size == DataOps.ragQueries)
    perQuery.values.foreach { rows =>
      assert(rows.length <= DataOps.annK)
      val ranks = rows.sortBy(_._2).map(_._2).toSeq
      assert(ranks == (1L to rows.length).toSeq, s"dense ranks expected: $ranks")
      val scores = rows.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }

    // recompute from the two published lists
    val dd = graft.Tables(spark, sf, "documents")
    val lex = graft.operators.Rag.bm25TopK(dd, col("text"), col("doc_id"),
        dd.filter(col("doc_id") < DataOps.ragQueries), col("text"), col("doc_id"),
        DataOps.annK, DataOps.bm25K1, DataOps.bm25B)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val de = graft.operators.Rag.hashEmbed(dd, col("text"), col("doc_id"))
    val vec = graft.operators.Similarity
      .bruteForceTopK(de, de.filter(col("vec_id") < DataOps.ragQueries), DataOps.annK)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    fused.foreach { case (q, _, doc, score) =>
      val expect =
        lex.get((q, doc)).map(r => 1.0 / (DataOps.rrfK0 + r)).getOrElse(0.0) +
          vec.get((q, doc)).map(r => 1.0 / (DataOps.rrfK0 + r)).getOrElse(0.0)
      assert(math.abs(score - expect) < 5e-7, s"q=$q doc=$doc: $score vs $expect")
    }
  }

  test("dd_cluster_sizes: histogram mass equals the corpus") {
    val n = graft.Tables(spark, sf, "documents").count()
    val hist = DataOps.ddClusterSizes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(t => t._1 * t._2).sum == n, "sizes×counts must cover every doc")
    assert(hist.forall(t => t._3 == (t._1 - 1) * t._2))
    assert(hist.map(_._1).distinct.length == hist.length)
  }
}
