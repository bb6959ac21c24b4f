package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The filter→dedup curation composite: verdicts, stage precedence,
  * threshold knobs. (Dedup scoping to the quality-surviving subset is
  * text-determined per gate, so identical-text fixtures can't observe
  * it — the DuckDB oracle, which scopes its dedup CTEs to the
  * quality CTE explicitly, pins that semantics at corpus scale.) */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  // trusted slice: a/b/c/d prose → bigram LM with |V| = 4;
  // unseen-context bigrams cost ln 4 ≈ 1.386 under add-one
  private lazy val ref =
    Seq("a b c a b d", "b a c b a d", "a b c d a b").toDF("text")

  private def verdicts(maxNll: Double, rows: (Long, String)*): Map[Long, String] =
    Curation.audit(rows.toDF("doc_id", "text"), col("text"), col("doc_id"),
        ref, 3, 0.3, maxTop2 = 0.5, maxDup5 = 0.6, maxAvgNll = maxNll)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private val clean = "a b c a d b c d a b d c" // avg nll 1.2125
  private val off = "x y z w x z w y x y w z"   // avg nll ln 4 = 1.3863
  private val spam = (1 to 10).map(_ => "a b").mkString(" ") // top2 = 1.0

  test("each gate fires with its own verdict and kept survives all three") {
    val out = verdicts(1.3,
      1L -> clean, // passes: top2 4/12, nll 1.2125
      2L -> spam,  // lm-fine (0.8852) but top-2-gram saturated → repetition
      3L -> off,   // every bigram unseen → 1.3863 > 1.3 → lm
      4L -> clean, // exact dup of 1 → duplicate
      5L -> "q")   // unscorable → lm (a gate that can't vouch doesn't pass)
    assert(out == Map(1L -> "kept", 2L -> "repetition", 3L -> "lm",
      4L -> "duplicate", 5L -> "lm"))
  }

  test("stage precedence: a duplicated spam pair reports repetition, not duplicate") {
    val out = verdicts(1.3, 1L -> clean, 2L -> spam, 3L -> spam)
    // doc 3 is an exact dup of doc 2, but both fall at the earlier gate
    assert(out == Map(1L -> "kept", 2L -> "repetition", 3L -> "repetition"))
  }

  test("gates are knobs: relaxing the lm cap re-admits off-domain text into dedup") {
    assert(verdicts(1.3, 1L -> off, 2L -> off) ==
      Map(1L -> "lm", 2L -> "lm"))
    assert(verdicts(10.0, 1L -> off, 2L -> off) ==
      Map(1L -> "kept", 2L -> "duplicate"))
  }
}
