package graft.forecast

import java.sql.Date
import org.apache.spark.sql.DataFrame
import scala.util.Try

/** F1/F3/F5/F6 — series extraction, forecast generation, date spine
  * and output frame (reference: src/data_processor.py:441-588).
  *
  * The daily summary is tiny by construction (one row per business
  * day), so collecting it to the driver is the correct design at any
  * fact-table scale — same boundary the reference draws (F1). Errors
  * are shielded: a failed fit yields None and the caller skips the
  * CSV (F6, src/data_processor.py:441-463).
  */
object ForecastReport {

  /** `onMetrics` (model name, in-sample MAE/MSE per series) fires
    * after a successful fit — the hook the staged pipeline uses to
    * render the reference's forecast-metrics console block without
    * this package depending on pipeline.Diagnostics. */
  def forecast(dailySummary: DataFrame, horizon: Int = 1,
               model: () => Forecaster = () => new LinearTrendForecaster(),
               onMetrics: Option[(String, Map[String, Double]) => Unit] = None): Option[DataFrame] =
    Try {
      val rows = dailySummary.select("date", "total_sales", "total_profit")
        .orderBy("date").collect()
      require(rows.nonEmpty, "empty daily summary")
      val dates = rows.map(_.getDate(0))
      def series(i: Int): Array[Double] =
        rows.map(r => Option(r.get(i)).map(v => BigDecimal(v.toString).toDouble).getOrElse(0.0))

      val salesModel = model().fit(series(1))
      val profitModel = model().fit(series(2))
      onMetrics.foreach { emit =>
        val (sMae, sMse) = salesModel.metrics(series(1))
        val (pMae, pMse) = profitModel.metrics(series(2))
        emit(salesModel.name, Map(
          "Sales MAE" -> sMae, "Sales MSE" -> sMse,
          "Profit MAE" -> pMae, "Profit MSE" -> pMse))
      }
      val salesF = salesModel.predict(horizon)
      val profitF = profitModel.predict(horizon)

      val last = dates.last.toLocalDate
      val spine = (1 to horizon).map(i => Date.valueOf(last.plusDays(i.toLong)))

      val spark = dailySummary.sparkSession
      import spark.implicits._
      spine.zip(salesF.zip(profitF)).map { case (d, (s, p)) => (d, s, p) }
        .toDF("date", "forecasted_sales", "forecasted_profit")
    }.toOption
}
