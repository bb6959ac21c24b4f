package graft.forecast

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.SparkSession

/** Prophet-class structural model (reference: src/time_series.py:16-43
  * fits Prophet — piecewise-linear trend with changepoints, Fourier
  * seasonality, uncertainty intervals). Prophet has no JVM port, so
  * this re-expresses its core decomposition as a ridge-regularized
  * linear model over deterministic features, fit with MLlib's
  * normal-equations solver (exact, seed-free, reproducible):
  *
  *   y(t) ≈ β₀ + β₁·t + Σⱼ γⱼ·max(0, t − sⱼ)        (trend + changepoints)
  *        + Σₖ aₖ·sin(2πkt/p) + bₖ·cos(2πkt/p)       (K-harmonic seasonality)
  *
  * Changepoints sⱼ are evenly spaced over the first 80% of the
  * training window (Prophet's default placement); the ridge penalty
  * plays the role of Prophet's Laplace prior on changepoint deltas —
  * it shrinks unused slope changes toward zero so the trend stays
  * piecewise-smooth. Uncertainty comes from the in-sample residual
  * spread (±z·σ), mirroring the shape (not the posterior math) of
  * Prophet's `yhat_lower`/`yhat_upper`.
  *
  * Same fit/predict/metrics surface as every other model, so it plugs
  * into ForecastReport via the `forecastModel` factory unchanged. The
  * series is driver-side by design (≤ one row per business day, the
  * F1 boundary); the heavy lifting — building the daily series from
  * 100 TB of lines — stays in the distributed plan.
  */
final class ProphetLikeForecaster(spark: SparkSession,
                                  seasonPeriod: Int = 7,
                                  harmonics: Int = 3,
                                  maxChangepoints: Int = 25,
                                  ridge: Double = 0.01,
                                  // pin changepoint locations (the oracle
                                  // row's ⌊0.4n⌋ quantization; ForecasterSpec
                                  // parity law) instead of the default
                                  // uniform placement
                                  changepointOverride: Option[Array[Double]] = None)
    extends Forecaster {

  private var yTrain: Array[Double] = Array.empty
  private var model: LinearRegressionModel = _
  private var changepoints: Array[Double] = Array.empty
  private var sigma: Double = 0.0

  def name = "prophet_like"

  private def features(t: Int) = {
    val hinges = changepoints.map(s => math.max(0.0, t - s))
    val season = (1 to harmonics).flatMap { k =>
      val w = 2 * math.Pi * k * t / seasonPeriod
      Seq(math.sin(w), math.cos(w))
    }
    Vectors.dense(((t.toDouble +: hinges) ++ season).toArray)
  }

  def fit(y: Array[Double]): Forecaster = {
    yTrain = y
    val n = y.length
    // Prophet default placement: candidates uniform over the first 80%
    // of the window; count scales down with short series so the design
    // matrix stays overdetermined.
    val nCp = math.max(0, math.min(maxChangepoints, (0.8 * n).toInt - 2))
    changepoints = changepointOverride.getOrElse(
      Array.tabulate(nCp)(j => 0.8 * n * (j + 1).toDouble / (nCp + 1)))
    import spark.implicits._
    val df = y.zipWithIndex.map { case (v, t) => (v, features(t)) }
      .toSeq.toDF("label", "features")
    model = new LinearRegression()
      .setSolver("normal").setRegParam(ridge).setStandardization(false)
      .fit(df)
    val f = fitted
    sigma = math.sqrt(
      y.indices.map(i => (y(i) - f(i)) * (y(i) - f(i))).sum / math.max(1, n - 1))
    this
  }

  def fitted: Array[Double] =
    Array.tabulate(yTrain.length)(t => model.predict(features(t)))

  def predict(h: Int): Array[Double] =
    Array.tabulate(h)(k => model.predict(features(yTrain.length + k)))

  /** (lower, point, upper) at z·σ of the in-sample residuals — the
    * yhat_lower/yhat/yhat_upper triple a Prophet caller expects. */
  def predictInterval(h: Int, z: Double = 1.96): Array[(Double, Double, Double)] =
    predict(h).map(p => (p - z * sigma, p, p + z * sigma))
}
