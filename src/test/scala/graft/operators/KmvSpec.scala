package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV bottom-k sketch laws: uniform-sample semantics, mergeability,
  * the small-group exact branch, and estimator accuracy. */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("group sample keeps min(k, n) rows per source, ranked by the id hash") {
    val out = DataOps.dsGroupSample(spark, sf)
    val sizes = out.groupBy("source").agg(count(lit(1)).as("n"),
        max("rk").as("maxrk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val counts = graft.Tables(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n, maxrk) =>
      assert(n == math.min(DataOps.samplePerKey.toLong, counts(src)))
      assert(maxrk == n, "ranks are dense from 1")
    }
  }

  test("the sample is a deterministic function of ids: stable under repartition") {
    val a = DataOps.dsGroupSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = DataOps.dsGroupSample(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("bottom-k sketches merge: the union's sketch equals the merged halves") {
    def hv(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val ids = (0L until 100L)
    val k = DataOps.samplePerKey
    def bottomK(xs: Seq[Long]) = xs.sortBy(i => (hv(i), i)).take(k)
    val merged = bottomK(bottomK(ids.filter(_ % 2 == 0)) ++ bottomK(ids.filter(_ % 2 == 1)))
    assert(merged == bottomK(ids),
      "KMV mergeability: bottomK(bottomK(A) ∪ bottomK(B)) == bottomK(A ∪ B)")
  }

  test("distinct estimate is exact below k and within KMV error above it") {
    // groups with known distinct counts: g0 has 10 distinct texts
    // (< k -> exact), g1 has 2000 (>> k -> estimated)
    val rows = (0 until 10).map(i => ("g0", s"small text $i")) ++
      (0 until 4000).map(i => ("g1", s"big text ${i % 2000}"))
    val df = rows.toDF("lang", "text")
    val s = graft.GraftSession.boundedAggSession(spark)
    val topk = udaf(new graft.functions.Aggregators.TopKByValue(DataOps.kmvK))
    val out = df
      .select(col("lang"),
        graft.functions.VectorFunctions.tokenHash(col("text")).as("hv"))
      .distinct()
      .select(col("lang"), (-col("hv")).as("nh"), col("hv"))
      .groupBy("lang").agg(topk(col("nh"), col("hv")).as("bot"))
      .select(col("lang"), size(col("bot")).cast("long").as("n_kept"),
        when(size(col("bot")) < DataOps.kmvK, size(col("bot")).cast("long"))
          .otherwise(expr(s"CAST(${DataOps.kmvK - 1} * 4294967296 AS BIGINT)" +
            s" div element_at(bot, ${DataOps.kmvK})._2"))
          .as("kmv_distinct"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("g0") == ((10L, 10L)), "below k the sketch IS the exact count")
    val (kept, est) = out("g1")
    assert(kept == DataOps.kmvK.toLong)
    // relative error ~1/sqrt(k-1) ~ 18%; 3 sigma bound
    assert(math.abs(est - 2000.0) / 2000.0 < 0.54,
      s"estimate $est too far from 2000")
  }
}
