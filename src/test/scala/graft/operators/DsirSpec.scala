package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-resampling laws on hand-built corpora. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  // target docs share a vocabulary; raw pool has one doc wearing it
  // and one wearing a disjoint vocabulary
  private def pool = Seq(
    (0L, "alpha beta gamma alpha beta", true),
    (1L, "beta gamma alpha beta gamma", true),
    (2L, "alpha beta gamma beta alpha", false), // target-like
    (3L, "zork quux blarg frobnitz zork", false) // off-distribution
  ).toDF("doc_id", "text", "is_target")

  test("target-like documents outweigh off-distribution ones") {
    val w = Dsir.weights(pool, col("text"), col("doc_id"), col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(2) > w(3),
      s"doc 2 wears the target vocabulary, doc 3 does not: $w")
    // the target docs themselves are maximally target-like
    assert(w(0) > w(3) && w(1) > w(3))
  }

  test("weights are exact integer sums of bag counts x micro-ratios") {
    val bag = Dsir.gramBag(pool, col("text"), col("doc_id"), col("is_target"))
    val byHand = bag.join(Dsir.ratios(bag), "bucket")
      .select(col("doc_id"), (col("cnt") * col("llr_micro")).as("term"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sum)
    val w = Dsir.weights(pool, col("text"), col("doc_id"), col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == byHand.toMap)
  }

  test("weights are partition-order invariant") {
    val base = Dsir.weights(pool, col("text"), col("doc_id"), col("is_target"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val shuffled = Dsir.weights(pool.repartition(7), col("text"), col("doc_id"),
      col("is_target"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(base == shuffled)
  }

  test("selectTopK ranks dense from 1 and respects the weight order") {
    val top = Dsir.selectTopK(pool, col("text"), col("doc_id"),
      col("is_target"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(top.map(_._3).toSeq == top.map(_._3).sortBy(x => -x).toSeq)
    assert(!top.map(_._2).contains(3L), "the off-distribution doc is cut first")
  }

  test("the bucket-model join broadcasts (never a corpus-sized shuffle)") {
    val plan = Dsir.weights(pool, col("text"), col("doc_id"), col("is_target"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("single-token documents contribute no bigrams") {
    val tiny = Seq((0L, "alpha", true), (1L, "alpha alpha", false))
      .toDF("doc_id", "text", "is_target")
    val bag = Dsir.gramBag(tiny, col("text"), col("doc_id"), col("is_target"))
      .groupBy("doc_id").agg(sum("cnt").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bag(0L) == 1L, "one unigram, zero bigrams")
    assert(bag(1L) == 3L, "two unigrams + one bigram")
  }
}
