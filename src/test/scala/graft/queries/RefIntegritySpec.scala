package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Referential-integrity audit: planted orphans land in their
  * statuses; ids-only join discipline. */
class RefIntegritySpec extends SparkSpec {

  test("planted orphans on both sides are counted in their statuses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("refint").toString
    Seq(0L, 1L, 2L, 10L).toDF("doc_id").withColumn("text", lit("t"))
      .write.parquet(s"$dir/documents.parquet")
    (Seq(0L, 1L, 2L, 20L, 21L).toDF("vec_id"))
      .withColumn("embedding", array(lit(1f))).withColumn("label", lit("x"))
      .write.parquet(s"$dir/embeddings.parquet")
    val out = DataOps.dqRefIntegrity(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("matched" -> 3L, "doc_only" -> 1L, "vec_only" -> 2L), out)
  }

  test("payloads never cross the audit join — only the id columns do") {
    val plan = DataOps.dqRefIntegrity(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("text#") && !plan.contains("embedding#"),
      s"audit must move 8-byte ids, not payloads:\n$plan")
  }
}
