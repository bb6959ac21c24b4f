package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P3 — daily summary (reference: src/data_processor.py:390-436).
  *
  * The reference computes the day's cost as a driver-side scalar
  * (`agg(...).collect()[0]`) and staples it on with `lit` (G3+T7);
  * since every batch holds exactly one calendar date, that is
  * equivalent to a grouped aggregate on the order date joined to the
  * sales summary — which is what we do, keeping the whole computation
  * distributed (SURVEY §4.3 rewrite 2).
  */
object Reports {

  def dailySummary(orders: DataFrame, lines: DataFrame, products: DataFrame): DataFrame = {
    val sales = orders
      .withColumn("order_date", to_date(col("order_datetime")))
      .groupBy("order_date")
      .agg(
        sum(col("total_amount")).as("total_sales"),
        countDistinct(col("order_id")).as("num_orders"))

    // J3 — left join: cancelled qty=0 lines contribute 0; cost is
    // cast to double before summing (src/data_processor.py:413-415).
    val cost = lines
      .join(broadcast(products.select(col("product_id"), col("cost_to_make"))),
            Seq("product_id"), "left")
      .withColumn("order_date", to_date(col("order_datetime")))
      .withColumn("line_cost", (col("quantity") * col("cost_to_make")).cast("double"))
      .groupBy("order_date")
      .agg(sum(col("line_cost")).as("total_cost_to_make"))

    sales
      .join(cost, Seq("order_date"), "left")
      .withColumn("total_profit", round(col("total_sales") - col("total_cost_to_make"), 2))
      .select(
        col("order_date").as("date"),
        col("num_orders"), col("total_sales"), col("total_profit"))
      .orderBy("date")
  }
}
