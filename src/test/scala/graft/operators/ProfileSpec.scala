package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Observation-based metrics and sketch accuracy bounds. */
class ProfileSpec extends SparkSpec {

  test("observed metrics ride the frame's own action — no second scan") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "v")
    val (obsDf, obs) = Profile.observed(df, Seq("v"))
    assert(obsDf.count() == 4) // the action the metrics piggyback on
    val m = obs.get
    assert(m("n_rows") == 4L && m("v_nulls") == 2L, s"metrics: $m")
  }

  test("approx percentile lands within the sketch's rank-error bound") {
    val sf = "/root/testdata/sf0.01"
    val approx = graft.queries.Relational
      .q34ApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (e50, e95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$k p50: approx=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 < 0.01, s"$k p95: approx=$a95 exact=$e95")
    }
  }
}
