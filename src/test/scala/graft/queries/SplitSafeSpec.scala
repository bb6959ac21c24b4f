package graft.queries

import graft.SparkSpec
import graft.operators.{Dedup, Graph, TextAnalysis}
import org.apache.spark.sql.functions._

/** Leakage-safe split invariants: one verdict per near-dup cluster,
  * singleton assignment identical to the naive per-doc split. */
class SplitSafeSpec extends SparkSpec {

  test("near-duplicate docs always share a split; singletons match dsSplit") {
    import spark.implicits._
    // 40 distinct docs + exact copies of docs 0..9 under far-away ids:
    // each copy pair is a guaranteed LSH candidate (identical shingles)
    val base = (0L until 40L).map(i =>
      i -> s"unique body $i with words w${i}a w${i}b w${i}c w${i}d")
    val copies = (0L until 10L).map(i => (1000L + i) -> base(i.toInt)._2)
    val df = (base ++ copies).toDF("doc_id", "text")

    val comp = Graph
      .connectedComponents(
        Dedup.minhashCandidatePairs(df, col("text"), col("doc_id"), 3),
        "id_a", "id_b")
      .withColumnRenamed("node", "doc_id")
    val assigned = df.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .select(col("doc_id"), col("component"),
        TextAnalysis.splitAssign(col("component")).as("split"))
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 50)

    // every planted pair shares one split
    val byId = rows.map(t => t._1 -> t).toMap
    (0L until 10L).foreach { i =>
      assert(byId(i)._3 == byId(1000L + i)._3,
        s"near-dup pair ($i, ${1000L + i}) straddles splits")
      assert(byId(i)._2 == byId(1000L + i)._2, "pair must share a component")
    }
    // components never straddle: one split per component globally
    assert(rows.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1))

    // singleton components (docs 10..39) reduce to the per-doc split
    val naive = df.filter(col("doc_id").between(10, 39))
      .select(col("doc_id"), TextAnalysis.splitAssign(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    naive.foreach { case (id, s) =>
      assert(byId(id)._3 == s, s"singleton $id diverged from dsSplit")
    }
  }
}
