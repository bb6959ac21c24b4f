package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-resampling laws on hand-built corpora. The
  * production path runs the single-pass kernels
  * ([[graft.plans.DsirKernels]]); [[Dsir.weightsExploded]] is the
  * retained independent reference (the Winnow interpreted-selection
  * precedent), and the central law here is kernel ≡ exploded, bit
  * for bit, across the tokenization edge cases. */
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

  // every tokenization edge the kernel's in-place byte walk must
  // reproduce from the exploded split/concat_ws form: empty text
  // (one empty token), leading/trailing/double spaces (empty tokens
  // KEPT, bigram = contiguous source slice), single token (no
  // bigrams), multi-byte UTF-8 (no 0x20-aliasing), and a null text
  // (no weight row at all)
  private def gnarly = Seq(
    (0L, "alpha beta gamma alpha beta", true),
    (1L, "", false),
    (2L, " leading", false),
    (3L, "trailing ", true),
    (4L, "two  spaces between", false),
    (5L, "solo", false),
    (6L, "über café naïve über", true),
    (7L, null.asInstanceOf[String], false),
    (8L, "   ", false)
  ).toDF("doc_id", "text", "is_target")

  private def weightMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kernel weights are bit-equal to the exploded reference (edge-case corpus)") {
    val kernel = weightMap(
      Dsir.weights(gnarly, col("text"), col("doc_id"), col("is_target")))
    val exploded = weightMap(
      Dsir.weightsExploded(gnarly, col("text"), col("doc_id"), col("is_target")))
    assert(kernel == exploded)
    assert(!kernel.contains(7L), "a null text yields no weight row on either path")
    assert(kernel.contains(1L) && kernel.contains(8L),
      "empty and all-space texts still carry (empty-token) weights")
  }

  test("kernel bucket counts equal the exploded bag's per-bucket sums") {
    val kernel = Dsir.bucketCounts(gnarly, col("text"), col("is_target"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val bag = Dsir.gramBag(gnarly, col("text"), col("doc_id"), col("is_target"))
    val byBucket = bag.groupBy("bucket").agg(
        sum("cnt").as("rn"),
        sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("tn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exploded = (0L until Dsir.buckets.toLong).map { b =>
      val (rn, tn) = byBucket.getOrElse(b, (0L, 0L))
      (b, rn, tn)
    }
    assert(kernel == exploded)
  }

  test("kernel ≡ exploded on 300 seeded-random documents (fuzz parity)") {
    // seeded generator over an adversarial alphabet: multi-byte UTF-8,
    // tokens that are empty / single-char / long, runs of consecutive
    // spaces, and ~5% empty or null texts — every shape the byte-walk
    // tokenizer must reproduce from split/concat_ws semantics
    val rng = new scala.util.Random(42)
    val alphabet = Vector("α", "ß", "日", "a", "bb", "ccc", "Z", "émü", "x9", "")
    def doc(): String =
      (0 until rng.nextInt(30)).map { _ =>
        alphabet(rng.nextInt(alphabet.size))
      }.mkString(if (rng.nextBoolean()) " " else "  ")
    val docs = (0L until 300L).map { i =>
      val t = rng.nextInt(20) match {
        case 0 => ""
        case 1 => null
        case _ => doc()
      }
      (i, t, rng.nextBoolean())
    }.toDF("doc_id", "text", "is_target")
    val kernel = weightMap(
      Dsir.weights(docs, col("text"), col("doc_id"), col("is_target")))
    val exploded = weightMap(
      Dsir.weightsExploded(docs, col("text"), col("doc_id"), col("is_target")))
    assert(kernel == exploded)
  }

  test("target-like documents outweigh off-distribution ones") {
    val w = weightMap(
      Dsir.weights(pool, col("text"), col("doc_id"), col("is_target")))
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
    val w = weightMap(
      Dsir.weights(pool, col("text"), col("doc_id"), col("is_target")))
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

  test("scoring is a shuffle-free projection: no explode, no join, kernel inline") {
    // a file-backed pool: over a LocalRelation the optimizer's
    // ConvertToLocalRelation folds the whole scoring projection away
    // (itself proof it IS a pure projection), leaving no plan to read
    val dir = java.nio.file.Files.createTempDirectory("dsir_plan").toString
    pool.write.mode("overwrite").parquet(dir)
    val filePool = spark.read.parquet(dir)
    val plan = Dsir.weights(filePool, col("text"), col("doc_id"), col("is_target"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_dsir_score"), plan)
    assert(!plan.contains("Generate explode"), s"gram explode resurfaced:\n$plan")
    assert(!plan.contains("Join"), s"model join resurfaced:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring pass shuffles:\n$plan")
  }

  test("single-token documents contribute no bigrams") {
    val tiny = Seq((0L, "alpha", true), (1L, "alpha alpha", false))
      .toDF("doc_id", "text", "is_target")
    val bag = Dsir.gramBag(tiny, col("text"), col("doc_id"), col("is_target"))
      .groupBy("doc_id").agg(sum("cnt").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bag(0L) == 1L, "one unigram, zero bigrams")
    assert(bag(1L) == 3L, "two unigrams + one bigram")
    // and the kernel count pass agrees on the total gram mass
    val kernelMass = Dsir.bucketCounts(tiny, col("text"), col("is_target"))
      .agg(sum("rn")).collect()(0).getLong(0)
    assert(kernelMass == 4L)
  }
}
