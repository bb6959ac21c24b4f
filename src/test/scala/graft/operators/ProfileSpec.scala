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

  test("neither profile path plans an Expand; approx distinct is within rsd") {
    val sf = "/root/testdata/sf0.01"
    val li = Tables(spark, sf, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey")
    val approx = Profile.numeric(li, cols)
    val exact = Profile.numericExact(li, cols)
    // multi-countDistinct in one agg would Expand the scan ×|cols|;
    // both the HLL default and the unpivot-first exact path avoid it
    Seq("approx" -> approx, "exact" -> exact).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), s"$name path planned an Expand:\n$plan")
    }
    val e = exact.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    approx.collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(4))
      val truth = e(c)
      assert(math.abs(est - truth).toDouble / truth < 0.15,
        s"$c: approx=$est exact=$truth")
    }
    // non-distinct stats are identical across paths
    val ex = exact.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    approx.collect().foreach { r =>
      assert(ex(r.getString(0)) == ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
    }
  }

  test("approx percentile lands within the sketch's rank-error bound") {
    val sf = "/root/testdata/sf0.01"
    // the registered q34 row now carries the bound as in-plan 1/0
    // columns (driver-hashable) — every bracket must hold
    graft.queries.Relational.q34ApproxPercentile(spark, sf).collect()
      .foreach { r =>
        assert(r.getLong(2) == 1L, s"${r.getString(0)} p50 out of rank bracket")
        assert(r.getLong(3) == 1L, s"${r.getString(0)} p95 out of rank bracket")
      }
    // and the raw sketch accuracy law the row summarizes: the
    // estimates land within 1% of the exact interpolated percentiles
    val approx = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
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
