package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Console diagnostics mirroring the reference's operator-facing
  * prints (src/data_processor.py:465-475 print_inventory_levels,
  * :543-547 _print_dataset_info, :487-511 forecast metrics) — the
  * last "What's missing" item a reference user would notice.
  *
  * Driver-side by design, like the reference: these render SMALL
  * frames (the product dimension, the per-day summary) for a human
  * terminal. The only full-frame work is the one aggregate each
  * summary needs, computed distributed BEFORE the tiny collect —
  * nothing here ever collects a fact table. */
object Diagnostics {

  /** CURRENT INVENTORY LEVELS block: one line per product, ordered by
    * id (reference prints the whole product dimension — 36 rows). */
  def inventoryLevels(productsUpdated: DataFrame, out: String => Unit = println): Unit = {
    out("\nCURRENT INVENTORY LEVELS")
    out("-" * 40)
    productsUpdated
      .select("product_id", "product_name", "current_stock")
      .orderBy("product_id")
      .collect()
      .foreach { r =>
        out(f"• ${r.getString(1)}%-30s (ID: ${r.get(0).toString}%3s): ${r.get(2).toString}%4s units")
      }
    out("-" * 40)
  }

  /** Dataset Information block over the daily summary: time span, row
    * count, average daily sales/profit. One distributed aggregate →
    * one 1-row collect. */
  def datasetInfo(dailySummary: DataFrame, out: String => Unit = println): Unit = {
    val r = dailySummary.agg(
      min(col("date")).as("d0"), max(col("date")).as("d1"),
      count(lit(1)).as("n"),
      // summary money columns are decimal; render as double
      avg(col("total_sales")).cast("double").as("avg_sales"),
      avg(col("total_profit")).cast("double").as("avg_profit")).collect()(0)
    out("Dataset Information:")
    out(s"• Time Period:          ${r.get(0)} to ${r.get(1)}")
    out(s"• Number of Data Points: ${r.getLong(2)}")
    out(f"• Average Daily Sales:   $$${r.getDouble(3)}%.2f")
    out(f"• Average Daily Profit:  $$${r.getDouble(4)}%.2f")
  }

  /** Forecast Error Metrics block (reference prints MAE/MSE per
    * fitted model). */
  def forecastMetrics(modelType: String, metrics: Map[String, Double],
                      out: String => Unit = println): Unit = {
    out("\nForecast Error Metrics:")
    out(s"Model Type: $modelType")
    metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out(f"$k%s: $$$v%.2f")
    }
  }
}
