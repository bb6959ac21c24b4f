package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Containment must catch the pair symmetric Jaccard structurally
  * misses: a short document embedded verbatim in a long one. */
class ContainmentSpec extends SparkSpec {

  test("a quoted subset scores high containment but low jaccard") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"q$i").mkString(" ")          // 8 3-grams
    val long = ((1 to 10).map(i => s"q$i") ++ (1 to 40).map(i => s"w$i")).mkString(" ")
    val df = Seq((1L, short), (2L, long), (3L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, col("text"), col("doc_id"), 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == 1)
    val (a, b, common, ca, cb) = got.head
    assert((a, b) == (1L, 2L))
    assert(common == 8L && ca == 1.0, s"all of doc 1 inside doc 2: $got")
    assert(cb < 0.2, "containment is asymmetric by construction")
    // ...and the symmetric measure indeed never reaches the cut
    val jac = Dedup.jaccardPairs(df, col("text"), col("doc_id"), 3, 0.3)
      .collect()
    assert(jac.isEmpty, "jaccard must miss the quoted-subset pair at its threshold")
  }

  test("capped pairs ⊆ uncapped pairs; only stop-shingle evidence is dropped") {
    import spark.implicits._
    // 8 docs all sharing the boilerplate prefix 'b1 b2 b3 b4' (three
    // 3-gram stop-shingles with posting length 8), plus one planted
    // true subset pair whose shared shingles are private to it
    val quote = (1 to 9).map(i => s"q$i").mkString(" ")
    val docs = (1L to 8L).map { d =>
      val tail =
        if (d == 7L) quote
        else if (d == 8L) quote + " " + (1 to 20).map(i => s"w$i").mkString(" ")
        else (1 to 12).map(i => s"u${d}_$i").mkString(" ")
      (d, s"b1 b2 b3 b4 $tail")
    }.toDF("doc_id", "text")
    def pairs(cap: Int) =
      Dedup.containmentPairs(docs, col("text"), col("doc_id"), 3, 0.1,
          maxPostingLen = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(4) // drops the 8-doc boilerplate postings
    assert(capped.subsetOf(uncapped),
      s"capping may only DROP pairs: capped=$capped uncapped=$uncapped")
    // at this low threshold the boilerplate alone drags every doc
    // pair over the line in the uncapped join — C(8,2) = 28 pairs...
    assert(uncapped.size == 28, s"uncapped=$uncapped")
    // ...while the cap keeps exactly the pair with PRIVATE shared
    // evidence: the planted subset (posting length 2 per shingle)
    assert(capped == Set((7L, 8L)), s"capped=$capped")
    // and the DEFAULT is the capped posture (the signature's contract)
    assert(Dedup.containmentDefaultCap == 2000)
  }

  test("containment equals jaccard numerator/denominator algebra on equal-size docs") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"t$i").mkString(" ")
    val near = base.replace("t30", "zz")
    val df = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(df, col("text"), col("doc_id"), 3, 0.5)
      .collect().head
    // 28 shingles each, 27 shared → both ratios 27/28
    assert(r.getLong(2) == 27L)
    assert(r.getDouble(3) == math.rint(27.0 / 28.0 * 1e6) / 1e6)
    assert(r.getDouble(3) == r.getDouble(4))
  }
}
