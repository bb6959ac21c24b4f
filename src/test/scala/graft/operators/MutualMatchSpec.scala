package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus mutual-best-match laws (Similarity.mutualMatches). */
class MutualMatchSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halves: (DataFrame, DataFrame) = {
    val e = Tables(spark, sf, "embeddings")
    (e.filter(pmod(col("vec_id"), lit(2)) === 0),
      e.filter(pmod(col("vec_id"), lit(2)) === 1))
  }

  test("mutual matches form a partial matching: each id appears at most once") {
    val (a, b) = halves
    val m = Similarity.mutualMatches(a, b).collect()
    assert(m.nonEmpty)
    val aIds = m.map(_.getLong(0))
    val bIds = m.map(_.getLong(1))
    assert(aIds.distinct.length == aIds.length, "an a-side vector matched twice")
    assert(bIds.distinct.length == bIds.length, "a b-side vector matched twice")
  }

  test("every mutual pair is rank-1 in BOTH directions of the ANN family") {
    val (a, b) = halves
    val m = Similarity.mutualMatches(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fwd = Similarity.lshAnnFor(b, a, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bwd = Similarity.lshAnnFor(a, b, 1)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(m == (fwd intersect bwd),
      s"mutual != fwd∩bwd: extra=${m -- (fwd intersect bwd)} missing=${(fwd intersect bwd) -- m}")
  }

  test("a planted near-identical cross-corpus pair is always mined") {
    val (a, b) = halves
    // clone an a-side vector into the b side under a fresh id with a
    // tiny perturbation: cosine ~1 beats every organic neighbor
    val donor = a.limit(1)
    val planted = donor.select(lit(1000001L).as("vec_id"),
      transform(col("embedding"), x => x * 1.000001f).as("embedding"),
      col("label"))
    val donorId = donor.collect()(0).getLong(0)
    val m = Similarity.mutualMatches(a, b.unionByName(planted))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.contains((donorId, 1000001L)),
      s"planted twin of $donorId not mined: $m")
  }

  test("margin verdict: outputs are forward-best with margin above the cut") {
    val (a, b) = halves
    val m = Similarity.marginMatches(a, b, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(m.nonEmpty)
    assert(m.map(_._1).distinct.length == m.length, "one proposal per a-vector")
    assert(m.forall(_._3 >= 1050000L), "every kept pair clears the 1.05 margin")
    // every margin pair's (a, b) must be a forward rank-1 of the ANN family
    val fwd = Similarity.lshAnnFor(b, a, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.map(x => (x._1, x._2)).toSet.subsetOf(fwd))
  }

  test("margin kills a uniform hub that mutual-best-match alone keeps") {
    // one direction, scaled: every cosine is exactly 1.0, so the
    // margin denominator equals the numerator -> margin 1.0 < 1.05
    def vec(scale: Float): Array[Float] = Array.tabulate(64)(i => scale * (i + 1))
    val a = Seq((0L, vec(1f), "x"), (2L, vec(2f), "x"), (4L, vec(3f), "x"))
      .toDF("vec_id", "embedding", "label")
    val b = Seq((1L, vec(1.5f), "x")).toDF("vec_id", "embedding", "label")
    assert(Similarity.mutualMatches(a, b).count() == 1,
      "mutual-best keeps one hub pair")
    assert(Similarity.marginMatches(a, b, k = 4).count() == 0,
      "the ratio margin recognizes the hub's uniform cosines and drops it")
  }

  test("hub suppression: a vector that is many queries' nearest keeps one partner") {
    // all fixtures share one direction (scaling preserves every
    // hyperplane sign → one bucket, cosine 1.0 for every pair): the
    // b-side hub is rank-1 for all three a-vectors, but the hub's own
    // rank-1 is the tie-break winner — exactly one mutual pair
    def vec(scale: Float): Array[Float] = Array.tabulate(64)(i => scale * (i + 1))
    val a = Seq((0L, vec(1f), "x"), (2L, vec(2f), "x"), (4L, vec(3f), "x"))
      .toDF("vec_id", "embedding", "label")
    val b = Seq((1L, vec(1.5f), "x")).toDF("vec_id", "embedding", "label")
    val m = Similarity.mutualMatches(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m.toSeq == Seq((0L, 1L)),
      s"exactly the tie-break a-vector keeps the hub: ${m.toSeq}")
  }
}
