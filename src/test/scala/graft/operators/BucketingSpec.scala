package graft.operators

import graft.SparkSpec
import graft.queries.DataOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed layout's whole reason to exist is plan shape: the
  * join over two tables bucketed+sorted on the key must run with no
  * exchange and no sort, and an equality predicate on the bucket key
  * must prune to a single bucket at the scan. Results must be
  * layout-independent (equal to the plain join).
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Final adaptive plan only — the AQE toString appends the initial
    * plan after a marker, which would double-count every node. */
  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
  }

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("bucketed fact-fact join: no exchange, no sort below the join") {
    val p = finalPlan(DataOps.dsBucketedJoin(spark, sf))
    assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
    // the only shuffle in the whole query is the 5-row priority rollup
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1,
      s"join sides must be exchange-free (bucketed layout):\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"plan:\n$p")
    // one file per bucket (writeBucketed repartitions first) ⇒ the scan
    // reports sorted output and the SMJ needs no Sort on either side
    assert(!p.contains("Sort ["), s"bucketed+sorted scan must satisfy the join order:\n$p")
  }

  test("equality predicate on the bucket key prunes to one bucket at the scan") {
    // materialize the tables (idempotent), then probe one key
    DataOps.dsBucketedJoin(spark, sf).collect()
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    // autoBucketedScan turns bucketed reads OFF when no operator above
    // needs the hash distribution — but for a point lookup the bucket
    // FILTER is the benefit (scan 1/n of the files), so a lookup
    // workload pins it on; assert the pruning that buys
    val saved = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = spark.table(s"li_bkt_$tag").filter(col("l_orderkey") === 1L)
      val p = finalPlan(probe)
      assert(p.contains(s"SelectedBucketsCount: 1 out of ${DataOps.bucketCount}"),
        s"bucket pruning not applied:\n$p")
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
  }

  test("bucketed join result equals the plain (layout-free) join") {
    val bucketed = DataOps.dsBucketedJoin(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("cents",
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0).cast("long"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), (sum(col("cents")) / 100.0).as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed == plain)
  }
}
