package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The single-pass SimHash kernel's contract: bit-equal to the
  * exploded vote-sum reference on BOTH hash backends (md5 ≤32 bits,
  * xxhash64 wider), multiset semantics (every occurrence votes), and
  * a shuffle-free plan. */
class SimHashKernelSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = {
    val rng = new scala.util.Random(23)
    val alphabet = Vector("α", "ß", "日", "a", "bb", "ccc", "Z", "émü", "x9", "")
    (Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, ""), (2L, "solo"),
      (3L, "dup dup dup dup"), // multiset: repeated votes must count
      (4L, null.asInstanceOf[String]), (5L, "über café naïve"),
      (6L, "a  b  c"), (7L, " lead trail ")) ++
      (8L until 150L).map { i =>
        (i, (0 until rng.nextInt(25))
          .map(_ => alphabet(rng.nextInt(alphabet.size)))
          .mkString(if (rng.nextBoolean()) " " else "  "))
      }).toDF("doc_id", "text")
  }

  private def fpMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kernel fingerprints are bit-equal to the exploded reference (md5, 32-bit)") {
    val kernel = fpMap(Dedup.simhash(fixture, col("text"), col("doc_id"), 32))
    val exploded = fpMap(Dedup.simhashExploded(fixture, col("text"), col("doc_id"), 32))
    assert(kernel == exploded)
    assert(!kernel.contains(4L), "null text yields no fingerprint on either path")
    assert(kernel.contains(1L), "empty text votes with its one empty token")
  }

  test("kernel fingerprints are bit-equal to the exploded reference (xxhash64, 64-bit)") {
    val kernel = fpMap(Dedup.simhash(fixture, col("text"), col("doc_id"), 64))
    val exploded = fpMap(Dedup.simhashExploded(fixture, col("text"), col("doc_id"), 64))
    assert(kernel == exploded)
  }

  test("fingerprint pass is a shuffle-free projection") {
    val dir = java.nio.file.Files.createTempDirectory("sh_plan").toString
    Seq((0L, "a b c d e"), (1L, "f g h i j"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = Dedup.simhash(spark.read.parquet(dir),
        col("text"), col("doc_id"), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_simhash"), plan)
    assert(!plan.contains("Generate explode"), s"token explode resurfaced:\n$plan")
    assert(!plan.contains("Exchange"), s"fingerprint pass shuffles:\n$plan")
  }
}
