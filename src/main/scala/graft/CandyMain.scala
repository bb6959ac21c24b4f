package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.CandyPipeline

/** CLI for the candy-store pipeline (mirrors the reference's
  * load → batch → forecast orchestration, src/main.py:139-236, as a
  * single declarative run — the Airflow DAG's three stages collapse
  * because Spark's lazy plans make the Parquet handoffs unnecessary
  * on one cluster).
  *
  * Usage: graft.CandyMain <dataDir> <outputDir> [--reload-daily] [--horizon N]
  */
object CandyMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CandyMain <dataDir> <outputDir> [--reload-daily] [--horizon N]")
    val dataDir = args(0)
    val outDir = args(1)
    val reloadDaily = args.contains("--reload-daily")
    val horizon = args.sliding(2).collectFirst {
      case Array("--horizon", n) => n.toInt }.getOrElse(1)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("candy-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val r = CandyPipeline.run(spark, dataDir, Some(outDir), reloadDaily, horizon)
    println(s"orders=${r.orders.count()} lines=${r.orderLineItems.count()} " +
      s"days=${r.dailySummary.count()} products=${r.productsUpdated.count()}")
    spark.stop()
  }
}
