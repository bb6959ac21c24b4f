package graft.forecast

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.SparkSession

/** MLlib-backed forecaster (BASELINE.json: "DataFrame transformations
  * + MLlib for forecasting"): LinearRegression with the deterministic
  * normal-equations solver over [t, sin(2πt/p), cos(2πt/p)] features —
  * a trend + single-harmonic seasonal model. Same Forecaster surface
  * as the pure-Scala models; the series is driver-side by design
  * (≤ one row per business day, F1 boundary).
  */
final class MllibForecaster(spark: SparkSession, seasonPeriod: Int = 7) extends Forecaster {

  private var yTrain: Array[Double] = Array.empty
  private var model: LinearRegressionModel = _

  def name = "mllib_linear"

  private def features(t: Int) = Vectors.dense(
    t.toDouble,
    math.sin(2 * math.Pi * t / seasonPeriod),
    math.cos(2 * math.Pi * t / seasonPeriod))

  def fit(y: Array[Double]): Forecaster = {
    yTrain = y
    import spark.implicits._
    val df = y.zipWithIndex
      .map { case (v, t) => (v, features(t)) }
      .toSeq.toDF("label", "features")
    model = new LinearRegression()
      .setSolver("normal").setRegParam(0.0).setStandardization(false)
      .fit(df)
    this
  }

  def fitted: Array[Double] =
    Array.tabulate(yTrain.length)(t => model.predict(features(t)))

  def predict(h: Int): Array[Double] =
    Array.tabulate(h)(k => model.predict(features(yTrain.length + k)))
}
