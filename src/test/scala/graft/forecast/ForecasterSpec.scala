package graft.forecast

import graft.SparkSpec

/** Deterministic forecaster behavior: exact recovery of linear
  * series, seasonal-naive repetition, in-sample metrics, and the
  * MLlib variant agreeing with the closed-form OLS on trend data. */
class ForecasterSpec extends SparkSpec {

  private val linear = Array.tabulate(14)(t => 10.0 + 2.5 * t)

  test("linear trend recovers an exact linear series and extrapolates it") {
    val m = new LinearTrendForecaster().fit(linear)
    val pred = m.predict(2)
    assert(math.abs(pred(0) - (10.0 + 2.5 * 14)) < 1e-9)
    assert(math.abs(pred(1) - (10.0 + 2.5 * 15)) < 1e-9)
    val (mae, mse) = m.metrics(linear)
    assert(mae < 1e-9 && mse < 1e-12)
  }

  test("seasonal naive repeats the last period") {
    val season = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0)
    val m = new SeasonalNaiveForecaster(7).fit(season)
    assert(m.predict(3).toSeq == Seq(11.0, 12.0, 13.0))
  }

  test("single-point series forecasts flat") {
    assert(new LinearTrendForecaster().fit(Array(42.0)).predict(2).toSeq == Seq(42.0, 42.0))
  }

  test("MLlib normal-solver regression matches closed-form OLS on a trend") {
    val m = new MllibForecaster(spark).fit(linear)
    val pred = m.predict(1)
    assert(math.abs(pred(0) - (10.0 + 2.5 * 14)) < 1e-6,
      s"got ${pred(0)}, want ${10.0 + 2.5 * 14}")
    val (mae, _) = m.metrics(linear)
    assert(mae < 1e-6)
  }
}
