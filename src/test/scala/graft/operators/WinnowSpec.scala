package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing laws (Schleimer 2003): local coverage, the shared-passage
  * guarantee, and the pair verdict. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  private val k = 4
  private val w = 4

  private def fps(rows: Seq[(Long, String)]) =
    Winnow.fingerprints(rows.toDF("doc_id", "text"), col("text"), col("doc_id"), k, w)

  test("coverage invariant: every w-gram window holds a selected position") {
    val text = (1 to 60).map(i => s"tok${i * 37 % 19}_$i").mkString(" ")
    val sel = fps(Seq((0L, text))).collect().map(_.getLong(1)).toSet
    val m = 60 - k + 1
    (1 to (m - w + 1)).foreach { j =>
      assert((j until j + w).exists(p => sel.contains(p.toLong)),
        s"window starting at $j has no fingerprint (selected: ${sel.toSeq.sorted})")
    }
  }

  test("fingerprint count is ~m/w selected, not every gram") {
    val text = (1 to 100).map(i => s"word${i % 83}x$i").mkString(" ")
    val n = fps(Seq((0L, text))).count()
    val m = 100 - k + 1
    assert(n < m, s"winnowing must select a subset ($n of $m grams)")
    assert(n >= (m - w + 1) / w, "coverage forces at least one per window stride")
  }

  test("shared passage of w+k-1 tokens forces a shared fingerprint") {
    val passage = (1 to (w + k - 1)).map(i => s"shared$i").mkString(" ")
    val a = s"preamble one two three $passage tail alpha beta gamma delta"
    val b = s"totally different words here entirely $passage other ending tokens now"
    val f = fps(Seq((0L, a), (1L, b)))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val fa = f.filter(_._1 == 0L).map(_._2).toSet
    val fb = f.filter(_._1 == 1L).map(_._2).toSet
    assert((fa intersect fb).nonEmpty,
      "the winnowing guarantee: a w+k-1 token passage shares a fingerprint")
  }

  test("documents shorter than k tokens vanish; exactly-k yields one fingerprint") {
    val out = fps(Seq((0L, "a b c"), (1L, "a b c d")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!out.map(_._1).contains(0L))
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 1L)))
  }

  test("sharedPairs flags the planted copy and respects the hot cap") {
    val passage = (1 to 20).map(i => s"copied$i").mkString(" ")
    val boiler = (1 to k).map(i => s"footer$i").mkString(" ")
    val docs = Seq(
      (0L, s"one two three four five six $passage seven eight nine ten eleven"),
      (1L, s"alpha beta gamma delta epsilon $passage zeta eta theta iota kappa"),
      (2L, s"unrelated prose about other matters entirely with no overlap at all")
    ).map { case (i, t) => (i, s"$t $boiler") } // every doc ends in boilerplate
    val f = Winnow.fingerprints(docs.toDF("doc_id", "text"),
      col("text"), col("doc_id"), k, w)
    val pairs = Winnow.sharedPairs(f, minShared = 2, maxPostingLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)),
      s"only the copied-passage pair may survive: ${pairs.toSeq}")
  }

  test("aligned spans: a planted copy aligns at one constant offset") {
    val passage = (1 to 20).map(i => s"copied$i").mkString(" ")
    val a = s"one two three four five six $passage tail1 tail2 tail3 tail4"
    val b = s"${(1 to 12).map(i => s"pre$i").mkString(" ")} $passage end1 end2"
    val f = fps(Seq((0L, a), (1L, b)))
    val spans = Winnow.alignedSpans(f, minAligned = 2, maxPostingLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.length == 1, s"one copied region, one offset: ${spans.toSeq}")
    val (aId, bId, offset, aligned) = spans.head
    assert((aId, bId) == (0L, 1L))
    // passage starts at token 7 in a and token 13 in b -> offset -6
    assert(offset == -6L, s"offset $offset")
    assert(aligned >= 2L)
  }

  test("the md5 oracle backend preserves the coverage invariant too") {
    // the default path above runs the xxh64 rolling kernel; the law is
    // hash-agnostic, so the replayable backend must satisfy it as well
    val text = (1 to 60).map(i => s"tok${i * 41 % 23}_$i").mkString(" ")
    val sel = Winnow.fingerprints(Seq((0L, text)).toDF("doc_id", "text"),
        col("text"), col("doc_id"), k, w, oracleHash = true)
      .collect().map(_.getLong(1)).toSet
    val m = 60 - k + 1
    (1 to (m - w + 1)).foreach { j =>
      assert((j until j + w).exists(p => sel.contains(p.toLong)),
        s"window starting at $j has no fingerprint under the md5 backend")
    }
  }

  test("kernel and md5 backends reach the same copy-detection verdicts") {
    // fingerprint VALUES differ per backend (different hash, different
    // per-window argmins), but the coverage guarantee makes the PAIR
    // verdict on a planted w+k-1 passage backend-independent — the
    // production/oracle swap must not change what gets flagged
    val passage = (1 to 24).map(i => s"lifted$i").mkString(" ")
    val docs = Seq(
      (0L, s"one two three four five six $passage seven eight nine ten eleven"),
      (1L, s"alpha beta gamma delta epsilon $passage zeta eta theta iota kappa"),
      (2L, s"unrelated prose about other matters entirely with no overlap anywhere here"),
      (3L, s"${(1 to 14).map(i => s"pre$i").mkString(" ")} $passage closing words")
    ).toDF("doc_id", "text")
    def verdicts(oracleHash: Boolean) = {
      val f = Winnow.fingerprints(docs, col("text"), col("doc_id"), k, w, oracleHash)
      Winnow.sharedPairs(f, minShared = 2, maxPostingLen = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val kernel = verdicts(false)
    val md5p = verdicts(true)
    assert(kernel == Set((0L, 1L), (0L, 3L), (1L, 3L)),
      s"kernel backend must flag exactly the planted copies: $kernel")
    assert(kernel == md5p, s"backend verdict drift: kernel=$kernel md5=$md5p")
    // the aligned-region step agrees on WHICH pairs align as well
    def aligned(oracleHash: Boolean) = {
      val f = Winnow.fingerprints(docs, col("text"), col("doc_id"), k, w, oracleHash)
      Winnow.alignedSpans(f, minAligned = 2, maxPostingLen = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(aligned(false) == aligned(true),
      "offset-consistent region pairs must match across backends")
  }

  test("compiled deque selection is row-identical to the interpreted argmin") {
    // the kernel (graft.plans.WinnowSelect) must reproduce the
    // interpreted transform/aggregate composition EXACTLY — same
    // (doc_id, pos, fp) rows — on adversarial shapes: repeated grams
    // (tie chains), short docs (m < w and m == 1), long mixed docs;
    // and on BOTH hash backends, since selection is a pure function
    // of the hash array
    val rng = new scala.util.Random(59)
    val docs = (0L until 40L).map { i =>
      val len = (rng.nextInt(30) + k) min 64
      val vocab = rng.nextInt(5) + 2 // small vocab → dense ties
      (i, (1 to len).map(_ => s"t${rng.nextInt(vocab)}").mkString(" "))
    } ++ Seq((100L, (1 to k).map(i => s"u$i").mkString(" ")), // m == 1
             (101L, (1 to (k + 1)).map(_ => "same").mkString(" "))) // m = 2, tie
    val df = docs.toDF("doc_id", "text")
    Seq(false, true).foreach { oh =>
      val kern = Winnow.fingerprints(df, col("text"), col("doc_id"), k, w,
          oracleHash = oh, kernelSelect = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val interp = Winnow.fingerprints(df, col("text"), col("doc_id"), k, w,
          oracleHash = oh, kernelSelect = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(kern == interp,
        s"kernel/interpreted drift (oracleHash=$oh): " +
          s"only-kernel=${(kern -- interp).take(5)} only-interp=${(interp -- kern).take(5)}")
    }
  }

  test("rightmost-minimum rule: ties select the later position") {
    // identical grams → identical hashes everywhere; the argmin must
    // take the rightmost position of each window, and overlapping
    // windows then agree (one fingerprint per window end)
    val text = (1 to 12).map(_ => "same").mkString(" ")
    val sel = fps(Seq((0L, text))).collect().map(_.getLong(1)).sorted
    val m = 12 - k + 1 // 9 grams, all equal
    assert(sel.last == m.toLong, "the last window's rightmost position wins")
    assert(sel.toSet == ((w to m).map(_.toLong).toSet),
      s"each window selects its rightmost slot: $sel")
  }
}
