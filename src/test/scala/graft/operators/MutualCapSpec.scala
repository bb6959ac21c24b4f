package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Hot-bucket cap laws for the alignment family (Similarity
  * .mutualMatches / marginMatches, maxBucket): the deterministic
  * hash-residue sub-split is a pure blocking refinement — a cap wider
  * than every bucket is a no-op, and under an active cap the verdict
  * equals mutual-best over exactly the same-slice candidate set
  * (candidates are only ever LOST relative to the uncapped join,
  * never invented). */
class MutualCapSpec extends SparkSpec {

  import spark.implicits._

  /** JVM replica of functions.VectorFunctions.tokenHash — first 8 hex
    * chars of md5 as a long (the slice hash the cap keys on). */
  private def tokenHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private val sf = "/root/testdata/sf0.001"

  test("a cap above every bucket size reproduces the uncapped verdict exactly") {
    val e = Tables(spark, sf, "embeddings")
    val a = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    def pairs(cap: Int) = Similarity.mutualMatches(a, b, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(1000000) == pairs(0),
      "nsub = 1 everywhere must reproduce the uncapped mutual verdict")
    def margins(cap: Int) = Similarity.marginMatches(a, b, k = 4, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(margins(1000000) == margins(0),
      "nsub = 1 everywhere must reproduce the uncapped margin verdict")
  }

  test("active cap = mutual-best over exactly the same-slice candidates") {
    // one shared direction: every vector lands in the SAME sign-LSH
    // bucket and every cross pair's cosine is exactly 1.0 after 6dp
    // rounding — ranking degenerates to the id tie-break, so the
    // capped verdict is computable by hand from the slice residues
    def vec(scale: Float): Array[Float] = Array.tabulate(64)(i => scale * (i + 1))
    val aIds = Seq(0L, 2L, 4L, 6L, 8L, 10L)
    val bIds = Seq(1L, 3L, 5L, 7L, 9L, 11L)
    val a = aIds.map(i => (i, vec(1f + i), "x")).toDF("vec_id", "embedding", "label")
    val b = bIds.map(i => (i, vec(1f + i), "x")).toDF("vec_id", "embedding", "label")
    val cap = 2
    val nsub = math.ceil(math.max(aIds.size, bIds.size) / cap.toDouble).toLong // 3
    def slice(id: Long) = java.lang.Math.floorMod(tokenHash(id.toString), nsub)
    // per slice: all cosines tie at 1.0, so mutual-best = (min a, min b)
    val expected = (0L until nsub).flatMap { s =>
      val as = aIds.filter(slice(_) == s)
      val bs = bIds.filter(slice(_) == s)
      if (as.nonEmpty && bs.nonEmpty) Some((as.min, bs.min)) else None
    }.toSet
    val got = Similarity.mutualMatches(a, b, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"capped verdict $got != hand-derived $expected")
    // and the cap genuinely engaged: the uncapped single bucket yields
    // exactly one mutual pair (the global tie-break winner)
    val uncapped = Similarity.mutualMatches(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((0L, 1L)))
    assert(expected.size > 1, "fixture must produce >1 slice with both sides")
  }

  test("capped margin verdicts still satisfy the forward-best and threshold laws") {
    val e = Tables(spark, sf, "embeddings")
    val a = e.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    val m = Similarity.marginMatches(a, b, k = 4, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(m.map(_._1).distinct.length == m.length, "one proposal per a-vector")
    assert(m.forall(_._3 >= 1050000L), "every kept pair clears the margin cut")
  }
}
