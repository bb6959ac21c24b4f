package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The write-once-shuffle-never contract of bucketed tables: joins
  * and aggregations on the bucket keys must plan with zero exchanges
  * (broadcast is disabled for the assertion — at test scale AQE would
  * otherwise broadcast the small side and hide the bucketing). */
class BucketingSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("co-bucketed join and bucket-key aggregation plan with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    Sinks.bucketedTable(Tables(spark, sf, "orders"), "b_orders", 8, Seq("o_orderkey"))
    Sinks.bucketedTable(Tables(spark, sf, "lineitem"), "b_lineitem", 8, Seq("l_orderkey"))

    withNoBroadcast {
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val expected = Tables(spark, sf, "lineitem").join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$joinPlan")

      val agg = spark.table("b_lineitem")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      agg.count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$aggPlan")
    }
  }

  test("a join on NON-bucket keys still shuffles (the layout is no magic)") {
    withNoBroadcast {
      val crossKey = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_partkey") === col("o_custkey"))
      crossKey.count()
      assert(crossKey.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }
}
