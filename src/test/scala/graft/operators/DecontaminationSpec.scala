package graft.operators

import graft.SparkSpec
import graft.queries.DataOps
import org.apache.spark.sql.functions._

/** Train/eval decontamination: the report must count shared distinct
  * n-grams exactly, and the decontaminated set must be precisely the
  * training rows absent from the report. */
class DecontaminationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("contamination pairs count shared distinct n-grams") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b c d e f"),        // 2 5-grams, both shared with eval 9
      (2L, "p q r s t u v"),      // 3 5-grams, one shared with eval 8
      (3L, "x1 x2 x3 x4 x5 x6"))  // novel
      .toDF("doc_id", "text")
    val eval = Seq(
      (9L, "a b c d e f"),
      (8L, "o p q r s t"))        // shares "p q r s t" with doc 2
      .toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(train, eval, col("text"), col("doc_id"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 9L) -> 2L, (2L, 8L) -> 1L))
    val kept = Dedup.decontaminated(train, eval, col("text"), col("doc_id"), 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("decontaminated set = train split minus reported train ids") {
    val report = DataOps.dsContamination(spark, sf)
      .select("train_id").collect().map(_.getLong(0)).toSet
    val kept = DataOps.dsDecontaminate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("split", TextAnalysis.splitAssign(col("doc_id")))
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(report.nonEmpty, "fixture: the corpus plants cross-split dups")
    assert(kept == train -- report)
  }
}
