package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** compressionSignals is the engine's ONE oracle-less operator (zlib
  * bitstream lengths have no SQL replay) — so this spec carries its
  * full correctness weight: banded ordering on planted fixtures,
  * exact arithmetic, determinism, and agreement with an independent
  * Deflater call (validating the batched plumbing end to end). */
class CompressionSpec extends SparkSpec {

  import spark.implicits._

  // deterministic high-entropy text: printable chars off an LCG
  private def gibberish(n: Int): String = {
    var x = 123456789L
    val sb = new StringBuilder
    (1 to n).foreach { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      sb.append((33 + math.floorMod(x >>> 33, 94L)).toChar)
    }
    sb.toString
  }

  private val prose = ("the quick brown fox jumps over the lazy dog " +
    "while seventeen analysts debate whether compression ratios " +
    "separate natural prose from generated filler text at scale ") * 5
  private val spammy = "buy now limited offer " * 60
  private val rand = gibberish(1200)

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    TextAnalysis.compressionSignals(rows.toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("banded ordering: boilerplate << prose << gibberish") {
    val out = run(Seq(1L -> spammy, 2L -> prose, 3L -> rand))
    val (_, _, rSpam) = out(1L)
    val (_, _, rProse) = out(2L)
    val (_, _, rRand) = out(3L)
    assert(rSpam < rProse && rProse < rRand,
      s"bands must separate: spam=$rSpam prose=$rProse rand=$rRand")
    assert(rSpam < 20, s"pure repetition must compress hard: $rSpam")
    assert(rRand > 80, s"high-entropy text must resist: $rRand")
  }

  test("exact arithmetic: ratio_pct = 100*n_deflate/n_bytes (floor), " +
      "n_bytes counts UTF-8 bytes, empty text reports 100") {
    val out = run(Seq(1L -> prose, 2L -> "", 3L -> "café"))
    out.foreach { case (id, (nb, nd, r)) =>
      if (nb > 0) assert(r == nd * 100L / nb, s"doc $id: $nb $nd $r")
    }
    assert(out(2L)._3 == 100L)
    assert(out(3L)._1 == 5L, s"é is two UTF-8 bytes: ${out(3L)}")
  }

  test("agrees with an independent single-shot Deflater (validates " +
      "the per-batch reset/reuse plumbing) and is run-deterministic") {
    // > one batch (64) so reuse across batch boundaries is exercised
    val rows = (1L to 150L).map(i =>
      i -> (if (i % 3 == 0) spammy else if (i % 3 == 1) prose
            else gibberish(100 + i.toInt)))
    val a = run(rows)
    val b = run(rows)
    assert(a == b, "two runs must be bit-identical")
    def oneShot(t: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    rows.take(10).foreach { case (i, t) =>
      assert(a(i)._2 == oneShot(t), s"doc $i deflate length drifted")
    }
  }
}
