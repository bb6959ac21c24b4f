package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard-negative mining: the class exclusion must be a join
  * predicate (k cross-class negatives even when same-class vectors
  * dominate the neighborhood), ranking must be exact cosine, and the
  * ANN form must agree with the exact form whenever the bucket holds
  * the true negatives. */
class HardNegativeSpec extends SparkSpec {

  // planted geometry on the unit circle's first quadrant (dims padded
  // to the corpus dim so the production hyperplanes apply): the
  // query's NEAREST vectors share its label; the cross-class
  // near-miss sits just behind them
  private def vec(theta: Double): Array[Float] = {
    val v = new Array[Float](Similarity.lshDims)
    v(0) = math.cos(theta).toFloat
    v(1) = math.sin(theta).toFloat
    v
  }

  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, vec(0.00), "a"),  // the query
      (1L, vec(0.02), "a"),  // same-class: nearest overall, must NOT appear
      (2L, vec(0.04), "a"),  // same-class
      (3L, vec(0.10), "b"),  // cross-class near-miss: the hard negative
      (4L, vec(0.30), "b"),  // cross-class, farther
      (5L, vec(1.40), "b")   // cross-class, nearly orthogonal
    ).toDF("vec_id", "embedding", "label")
  }

  test("negatives are k nearest CROSS-class vectors, same-class never leaks") {
    import spark.implicits._
    val e = fixture
    val out = Similarity.hardNegatives(e, e.filter(col("vec_id") === 0L), k = 2)
      .orderBy("rk").as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(3L, 4L),
      "rank must order by cosine among label-b vectors only")
    assert(out.forall(_._1 == 0L))
    // rank 1's cosine strictly below the same-class nearest: the miner
    // is returning near-misses, not re-finding the positives
    assert(out.head._3 < 1.0 && out.head._3 > out(1)._3)
  }

  test("rank k means k-th nearest negative, not cross-class top-k survivors") {
    // a post-filter of the overall top-2 would return ONLY vec 3 (the
    // top-2 are same-class 1 and 2 → zero or one cross-class row);
    // the join-predicate form must still produce exactly k rows
    val out = Similarity.hardNegatives(fixture,
      fixture.filter(col("vec_id") === 0L), k = 2)
    assert(out.count() == 2)
  }

  test("ANN form agrees with exact form when the bucket holds the negatives") {
    import spark.implicits._
    val e = fixture
    val q = e.filter(col("vec_id") === 0L)
    // the planted cluster is tight (max angle 1.4 rad spans few sign
    // flips); verify agreement on whatever the bucket actually holds
    val exact = Similarity.hardNegatives(e, q, k = 2)
      .as[(Long, Long, Double, Int)].collect()
    val ann = Similarity.hardNegativesAnn(e, q, k = 2)
      .as[(Long, Long, Double, Int)].collect()
    // ranks renumber within the bucket, so compare (pair, cosine) sets
    // and require ANN's cosine ORDER to be a subsequence of exact's
    val score = (t: (Long, Long, Double, Int)) => (t._1, t._2, t._3)
    assert(ann.map(score).toSet.subsetOf(
      Similarity.hardNegatives(e, q, k = 5).as[(Long, Long, Double, Int)]
        .collect().map(score).toSet),
      "every ANN row must carry the exact cosine of that pair")
    assert(ann.sortBy(_._4).map(_._3).sameElements(
      ann.map(_._3).sortBy(-_)), "bucket rerank must order by cosine desc")
    assert(ann.forall { case (_, neg, _, _) => Seq(3L, 4L, 5L).contains(neg) },
      "no same-class vector may survive the ANN join either")
    assert(exact.map(_._2).toSet == Set(3L, 4L))
  }
}
