package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.CandyPipeline

/** CLI for the candy-store pipeline (mirrors the reference's
  * load → batch → forecast orchestration, src/main.py:139-236, as a
  * single declarative run — the Airflow DAG's three stages collapse
  * because Spark's lazy plans make the Parquet handoffs unnecessary
  * on one cluster).
  *
  * Usage: graft.CandyMain <dataDir> <outputDir>
  *          [--reload-daily] [--horizon N]
  *          [--model linear|seasonal|mllib|prophet]
  */
object CandyMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CandyMain <dataDir> <outputDir> [--reload-daily] [--horizon N] [--model linear|seasonal|mllib|prophet]")
    val dataDir = args(0)
    val outDir = args(1)
    val reloadDaily = args.contains("--reload-daily")
    val horizon = args.sliding(2).collectFirst {
      case Array("--horizon", n) => n.toInt }.getOrElse(1)
    val modelName = args.sliding(2).collectFirst {
      case Array("--model", m) => m }.getOrElse("linear")

    val spark = GraftSession.create("candy-pipeline")

    val model: () => graft.forecast.Forecaster = modelName match {
      case "seasonal" => () => new graft.forecast.SeasonalNaiveForecaster()
      case "mllib" => () => new graft.forecast.MllibForecaster(spark)
      case "prophet" => () => new graft.forecast.ProphetLikeForecaster(spark)
      case _ => () => new graft.forecast.LinearTrendForecaster()
    }
    val stage = args.sliding(2).collectFirst {
      case Array("--stage", st) => st }.getOrElse("all")
    val ckpt = s"$outDir/_stages"
    // staged-path console blocks (same surface as the single-session
    // path's --verbose below; the reference DAG logs these per task)
    val stageLog: Option[String => Unit] =
      if (args.contains("--verbose")) Some(println) else None
    stage match {
      case "ingest" => graft.pipeline.CandyStages.ingest(spark, dataDir, ckpt)
      case "process" => graft.pipeline.CandyStages.process(spark, ckpt, reloadDaily, stageLog)
      case "report" =>
        graft.pipeline.CandyStages.report(spark, ckpt, outDir, horizon, model, stageLog)
      case "staged" => // all three stages, checkpointed (DAG contract)
        graft.pipeline.CandyStages.ingest(spark, dataDir, ckpt)
        graft.pipeline.CandyStages.process(spark, ckpt, reloadDaily, stageLog)
        graft.pipeline.CandyStages.report(spark, ckpt, outDir, horizon, model, stageLog)
      case _ =>
        val r = CandyPipeline.run(spark, dataDir, Some(outDir), reloadDaily, horizon, model)
        println(s"orders=${r.orders.count()} lines=${r.orderLineItems.count()} " +
          s"days=${r.dailySummary.count()} products=${r.productsUpdated.count()}")
        // operator-facing console blocks (reference's
        // print_inventory_levels / dataset-info prints)
        if (args.contains("--verbose")) {
          graft.pipeline.Diagnostics.datasetInfo(r.dailySummary)
          graft.pipeline.Diagnostics.inventoryLevels(r.productsUpdated)
        }
    }
    spark.stop()
  }
}
