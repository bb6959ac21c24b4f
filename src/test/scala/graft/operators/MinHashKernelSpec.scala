package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The single-pass MinHash signature kernel's contract: bit-equal to
  * the exploded shingle/distinct/groupBy reference (dropping the
  * distinct is sound because min is duplicate-invariant), same
  * no-row behavior for short documents, and a shuffle-free plan. */
class MinHashKernelSpec extends SparkSpec {

  import spark.implicits._

  private def sigMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toVector).toMap

  test("kernel signatures are bit-equal to the exploded reference (edge + fuzz)") {
    val rng = new scala.util.Random(11)
    val alphabet = Vector("α", "ß", "日", "a", "bb", "ccc", "Z", "émü", "x9", "")
    val docs = (Seq(
      (0L, "alpha beta gamma delta alpha beta gamma"),
      (1L, ""), (2L, "one two"), (3L, "one two three"),
      (4L, "dup dup dup dup dup"), // duplicate shingles: distinct-invariance
      (5L, null.asInstanceOf[String]), (6L, "über café naïve über café"),
      (7L, "a  b  c  d"), (8L, " lead trail ")) ++
      (9L until 150L).map { i =>
        (i, (0 until rng.nextInt(25))
          .map(_ => alphabet(rng.nextInt(alphabet.size)))
          .mkString(if (rng.nextBoolean()) " " else "  "))
      }).toDF("doc_id", "text")
    val kernel = sigMap(
      Dedup.minhashSignatures(docs, col("text"), col("doc_id"), 3))
    val exploded = sigMap(
      Dedup.minhashSignaturesExploded(docs, col("text"), col("doc_id"), 3))
    assert(kernel == exploded)
    assert(!kernel.contains(1L) && !kernel.contains(2L) && !kernel.contains(5L),
      "short and null docs yield no signature row on either path")
    assert(kernel.contains(3L), "an exactly-n-token doc has one shingle")
  }

  test("signature pass is a shuffle-free projection") {
    val dir = java.nio.file.Files.createTempDirectory("mh_plan").toString
    Seq((0L, "a b c d e"), (1L, "f g h i j"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = Dedup.minhashSignatures(spark.read.parquet(dir),
        col("text"), col("doc_id"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash"), plan)
    assert(!plan.contains("Generate explode"), s"shingle explode resurfaced:\n$plan")
    assert(!plan.contains("Exchange"), s"signature pass shuffles:\n$plan")
  }
}
