package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.io.{CsvSource, JsonSource, ParquetSource, Sinks}

/** The Airflow-DAG-shaped staged execution (SURVEY §3.2): three
  * idempotent stages handing state through Parquet checkpoints —
  * `ingest` → `process` → `report` — each runnable in its own session
  * / process, exactly like the reference's `load_data >>
  * batch_processing >> forecasting_and_output`
  * (src/candy_store_dag.py:229-248). `CandyPipeline.run` is the
  * single-session fast path; these stages are the multi-process
  * contract.
  */
object CandyStages {

  /** Stage 1 — ingest + normalize, persist raw tables
    * (src/candy_store_dag.py:76-116). The normalize runs here so the
    * allocation sequence key (file day / row / item position) is
    * captured before the data ever leaves its source files. */
  def ingest(spark: SparkSession, dataDir: String, ckpt: String,
             days: Option[Seq[String]] = None): Unit = {
    Sinks.parquet(
      CsvSource(s"$dataDir/customers.csv", Model.customerSchema).load(spark),
      s"$ckpt/customers")
    Sinks.parquet(
      CsvSource(s"$dataDir/products.csv", Model.productSchema).load(spark),
      s"$ckpt/products")
    Sinks.parquet(
      CandyPipeline.normalize(
        JsonSource(CandyPipeline.transactionPaths(dataDir, days),
            Model.transactionSchema)
          .load(spark)),
      s"$ckpt/items")
  }

  /** Stage 2 — allocation + report frames from checkpoints
    * (src/candy_store_dag.py:120-180). `log` (when set) renders the
    * reference batch task's console blocks — dataset info + inventory
    * levels (src/data_processor.py:465-475, :543-547) — after the
    * checkpoints land, from the already-written small frames. */
  def process(spark: SparkSession, ckpt: String, reloadDaily: Boolean = false,
              log: Option[String => Unit] = None): Unit = {
    val products = ParquetSource(s"$ckpt/products").load(spark)
    val items = ParquetSource(s"$ckpt/items").load(spark)
    val lines = CandyPipeline
      .allocateLines(CandyPipeline.enrich(items, products), reloadDaily).cache()
    val (orders, orderLineItems, dailySummary, productsUpdated) =
      CandyPipeline.buildReports(lines, products, reloadDaily)
    Sinks.parquet(lines, s"$ckpt/lines")
    Sinks.parquet(orders, s"$ckpt/orders")
    Sinks.parquet(orderLineItems, s"$ckpt/order_line_items")
    Sinks.parquet(dailySummary, s"$ckpt/daily_summary")
    Sinks.parquet(productsUpdated, s"$ckpt/products_updated")
    log.foreach { out =>
      Diagnostics.datasetInfo(dailySummary, out)
      Diagnostics.inventoryLevels(productsUpdated, out)
    }
  }

  /** Stage 3 — CSV emission + forecast from checkpoints
    * (src/candy_store_dag.py:184-225). Re-sorts on write: parquet
    * round-trips don't guarantee row order, and row order is part of
    * the output contract (§5). */
  def report(spark: SparkSession, ckpt: String, outDir: String,
             horizon: Int = 1,
             model: () => graft.forecast.Forecaster =
               () => new graft.forecast.LinearTrendForecaster(),
             log: Option[String => Unit] = None): Unit = {
    import org.apache.spark.sql.functions.col
    CandyPipeline.writeReports(
      ParquetSource(s"$ckpt/orders").load(spark).orderBy("order_id"),
      ParquetSource(s"$ckpt/order_line_items").load(spark)
        .orderBy("order_id", "product_id"),
      ParquetSource(s"$ckpt/daily_summary").load(spark).orderBy("date"),
      ParquetSource(s"$ckpt/products_updated").load(spark).orderBy(col("product_id")),
      outDir, horizon, model, log)
  }
}
