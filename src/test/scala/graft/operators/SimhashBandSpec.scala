package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Empirical proof of the banding claim: with 4 bands over 32 bits,
  * the band-blocked join must find EXACTLY the pairs a brute-force
  * all-pairs Hamming join finds at the ≤3-bit cutoff (pigeonhole —
  * ≤3 differing bits cannot touch all 4 bands). */
class SimhashBandSpec extends SparkSpec {

  test("banded Hamming-ball join equals brute force on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val banded = Dedup.simhashPairs(docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sim = Dedup.simhash(docs, col("text"), col("doc_id"))
    val brute = sim.as("a")
      .join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("h"))
      .filter(col("h") <= Dedup.simhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(banded == brute,
      s"banding lost/invented pairs: banded=${banded.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("64-bit/16-bit-band scale variant is lossless too, and its high bits are live") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val banded = Dedup.simhashPairs(docs, col("text"), col("doc_id"),
        bits = 64, bandBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sim = Dedup.simhash(docs, col("text"), col("doc_id"), bits = 64)
    val brute = sim.as("a")
      .join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("h"))
      .filter(col("h") <= Dedup.simhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"64/16 banding lost/invented pairs: banded=${banded.size} brute=${brute.size}")

    // the 100× rehearsal's 2.5e9-candidate incident: a >32-bit
    // fingerprint built on the 32-bit tokenHash has constant-0 high
    // bits, so every high band collapses into one bucket. Assert the
    // high 32 bits actually vary across the corpus.
    val highBits = sim.select(countDistinct(shiftright(col("simhash"), 32)).as("n"))
      .collect()(0).getLong(0)
    assert(highBits > 1, s"high 32 bits are dead (distinct=$highBits)")
  }

  test("banding rejects layouts that break the pigeonhole guarantee") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    intercept[IllegalArgumentException] {
      // 2 bands of 16 over 32 bits: 3 errors could corrupt both bands
      Dedup.simhashPairs(docs, col("text"), col("doc_id"), bits = 32, bandBits = 16)
    }
  }
}
