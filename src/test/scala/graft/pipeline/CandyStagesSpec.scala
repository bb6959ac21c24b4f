package graft.pipeline

import java.nio.file.Files
import graft.SparkSpec

/** The staged (DAG-shaped, parquet-checkpointed) execution must
  * produce exactly the single-session pipeline's results. */
class CandyStagesSpec extends SparkSpec {

  private val dataDir = "/root/reference/data/dataset_15"

  test("ingest → process → report equals the single-session run") {
    val ckpt = Files.createTempDirectory("candy_stages").toString
    CandyStages.ingest(spark, dataDir, ckpt)
    CandyStages.process(spark, ckpt)

    val single = CandyPipeline.run(spark, dataDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    val stagedOrders = spark.read.parquet(s"$ckpt/orders")
    val stagedSummary = spark.read.parquet(s"$ckpt/daily_summary")
    val stagedStock = spark.read.parquet(s"$ckpt/products_updated")
    assert(rows(stagedOrders) == rows(single.orders))
    assert(rows(stagedSummary) == rows(single.dailySummary))
    assert(rows(stagedStock) == rows(single.productsUpdated))
  }
}
