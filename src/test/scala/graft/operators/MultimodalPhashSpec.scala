package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The dHash kernel is pure integer math, so it gets closed-form
  * fixtures (monotone gradient → all bits, constant → none), the
  * perceptual invariance that justifies the hash (brightness shifts
  * keep every bit), and a banding-vs-brute-force equality on planted
  * near-dups. */
class MultimodalPhashSpec extends SparkSpec {

  private def buf(id: Long, f: (Int, Int, Int) => Int,
                  w: Int = 16, h: Int = 12, ch: Int = 3) =
    Multimodal.PixelBuffer(id, w, h, ch,
      Array.tabulate[Byte](w * h * ch) { i =>
        val p = i / ch; f(p / w, p % w, i % ch).toByte
      })

  private def hashOf(b: Multimodal.PixelBuffer): Long = {
    import spark.implicits._
    Multimodal.dHash(Seq(b).toDS()).collect().head.getLong(1)
  }

  test("strictly increasing gradient sets all 64 bits; constant sets none") {
    // gray increases with x at every grid sample → every left<right
    // comparison true → hash is all-ones (== -1L as a signed long)
    assert(hashOf(buf(1L, (_, x, _) => x * 10)) == -1L)
    assert(hashOf(buf(2L, (_, _, _) => 42)) == 0L)
  }

  test("brightness shift keeps every bit (the perceptual property)") {
    def textured(y: Int, x: Int, c: Int) = (x * 7 + y * 3 + c) % 90
    val base = hashOf(buf(3L, textured))
    val brighter = hashOf(buf(4L, (y, x, c) => textured(y, x, c) + 100))
    assert(base == brighter)
    assert(base != 0L && base != -1L) // the fixture actually exercises both bit values
  }

  test("gray is the integer mean across channels (2/3 floors to 0)") {
    // odd columns carry (1,1,0) → integer mean 0 → flat gray → no bits;
    // (1,1,1) → mean 1 → a real gradient. A per-channel or summed
    // comparison would see both as textured.
    val a = hashOf(buf(5L, (_, x, c) => if (x % 2 == 1 && c < 2) 1 else 0))
    val b = hashOf(buf(6L, (_, x, _) => if (x % 2 == 1) 1 else 0))
    assert(a == 0L)
    assert(b != 0L)
  }

  test("banded near-dup join equals brute force on planted near-dups") {
    import spark.implicits._
    def textured(y: Int, x: Int, c: Int) = (x * 11 + y * 5 + c * 2) % 120
    val original = buf(10L, textured)
    val dup = buf(11L, textured) // identical content, new id
    // flip one grid sample's gradient: perturb a single sampled pixel
    // hard enough to flip a handful of comparisons, not the whole hash
    val nearDup = buf(12L, (y, x, c) =>
      if (y == 0 && x == 0) 119 else textured(y, x, c))
    val far = buf(13L, (y, x, c) => (x * 37 + y * 13 + c * 7) % 97)
    val hashes = Multimodal.dHash(Seq(original, dup, nearDup, far).toDS())

    val banded = Multimodal.imageNearDups(hashes)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val brute = hashes.as("a")
      .join(hashes.as("b"), col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("long"))
      .as[(Long, Long, Long)].collect()
      .filter(_._3 <= Dedup.simhashMaxHamming).toSet

    assert(banded == brute)
    assert(banded.contains((10L, 11L, 0L))) // exact dup found at hamming 0
  }
}
