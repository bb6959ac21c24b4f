package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bounded-buffer top-k aggregate must (a) equal the window
  * row_number form row-for-row, and (b) run as a real two-phase
  * aggregate — partial buffers before the exchange — because O(k)
  * per-key state with map-side combine is its whole reason to exist. */
class TopKAggSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("aggregate top-3 equals window row_number top-3") {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderkey"))

    val topk = udaf(new Aggregators.TopKByValue(3))
    val viaAgg = ord.groupBy("o_custkey")
      .agg(topk(col("cents"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rk"),
        col("col._1").as("cents"), col("col._2").as("o_orderkey"))
      .collect().map(_.toSeq).toSet

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("cents").desc, col("o_orderkey"))
    val viaWindow = ord.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "cents", "o_orderkey")
      .collect().map(_.toSeq).toSet

    assert(viaWindow.nonEmpty)
    assert(viaAgg == viaWindow)
  }

  test("runs as a two-phase aggregate (partial before the exchange)") {
    val ord = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderkey"))
    val topk = udaf(new Aggregators.TopKByValue(3))
    val plan = ord.groupBy("o_custkey")
      .agg(topk(col("cents"), col("o_orderkey")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkbyvalue"),
      s"expected a partial aggregation phase in:\n$plan")
  }

  test("the raised ObjectHashAggregate fallback is scoped, not global") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val df = graft.queries.Relational.q37TopKAgg(spark, sf)
    // the bounded-buffer plan executes under the raised threshold...
    assert(df.sparkSession.conf.get(key) == "4194304")
    assert(df.count() > 0)
    // ...while the parent session keeps Spark's protective default, so
    // an unbounded ObjectHashAggregate elsewhere still falls back early
    assert(spark.conf.get(key) == "128",
      "parent session must keep the default fallback threshold")
  }
}
