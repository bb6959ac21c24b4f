package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{Crawl, DataOps, Relational}

/** Physical-plan shape assertions: the optimizations the engine
  * depends on at 100 TB must be visible in the executed plan, not
  * assumed — filter/projection pushdown into the parquet scan,
  * broadcast joins on dimension tables, bounded shuffle counts for
  * the allocator, and whole-stage codegen coverage.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("q1: predicate and projection push into the parquet scan") {
    val p = plan(Relational.q1FilterProject(spark, sf))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"),
      "projection not pruned to the 4 selected columns")
  }

  test("q2/q4: dimension joins are broadcast, not shuffled") {
    assert(plan(Relational.q2Join(spark, sf)).contains("BroadcastHashJoin"))
    val p4 = plan(Relational.q4StarJoin(spark, sf))
    assert(countOccurrences(p4, "BroadcastHashJoin") == 2,
      s"expected both part and supplier joins broadcast:\n$p4")
  }

  test("q5: aggregation is partial (map-side) then final — exactly one shuffle") {
    val p = plan(Relational.q5PricingSummary(spark, sf))
    assert(p.contains("HashAggregate"))
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, s"plan:\n$p")
  }

  test("allocator: exactly one hash-partition shuffle, catalog broadcast") {
    import spark.implicits._
    import graft.pipeline.{Allocate, Model}
    val demand = Seq(
      Model.DemandLine(1L, 1L, "2024-02-01T08:00:00.000001", 10L, 1L,
        BigDecimal("1.00"), 5L, 20240201, 0L, 0))
      .toDS()
    val p = plan(Allocate(demand).toDF())
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1,
      s"allocator must shuffle exactly once (by product):\n$p")
  }

  /** AQE only materializes codegen stages once executed — run the
    * query, then read the final adaptive plan string (whole-stage
    * codegen spans print as `*(n)` node prefixes). */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString()
  }

  test("q5 and the vector kernels run inside whole-stage codegen") {
    assert(finalPlan(Relational.q5PricingSummary(spark, sf)).contains("*("))
    val p = finalPlan(DataOps.ddEmbedNearDups(spark, sf))
    assert(p.contains("*("), s"vector pipeline fell out of codegen:\n$p")
    assert(p.toLowerCase.contains("floatvectordot") || p.contains("graft_fvdot"),
      s"native dot expression not in plan:\n$p")
  }

  test("partitioned parquet layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    val ev = Tables(spark, sf, "events")
      .withColumn("etype", col("event_type"))
    graft.io.Sinks.partitionedParquet(ev, dir, Seq("etype"))
    val p = plan(spark.read.parquet(dir).filter(col("etype") === "click"))
    assert(p.contains("PartitionFilters: [isnotnull(etype"),
      s"partition filter not applied at the scan:\n$p")
    // only the matching directory is read
    assert(spark.read.parquet(dir).filter(col("etype") === "click")
      .queryExecution.executedPlan.toString.contains("etype"))
  }

  test("orc roundtrip preserves data and pushes filters into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    val li = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    graft.io.Sinks.orc(li, dir)
    val back = graft.io.OrcSource(dir).load(spark)
    assert(back.count() == li.count())
    val p = plan(back.filter(col("l_quantity") > 25).select("l_orderkey", "l_quantity"))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity"),
      s"filter not pushed to the ORC scan:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"),
      s"unused column not pruned from the ORC scan:\n$p")
  }

  test("bucketed tables join without any shuffle (co-located join)") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bkt")
    // force the shuffled-join path (the tiny test table would
    // otherwise broadcast and hide the bucketing behavior)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
      // both sides arrive pre-partitioned by the bucket key, so the
      // only exchange in the whole plan is the aggregation's own
      assert(p.contains("SortMergeJoin"), s"plan:\n$p")
      assert(countOccurrences(p, "Exchange hashpartitioning(l_orderkey") == 0
        && countOccurrences(p, "Exchange hashpartitioning(o_orderkey") == 0,
        s"bucketed join still shuffles its inputs:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** AdaptiveSparkPlan.toString appends the pre-AQE initial plan —
    * slice to the final section before counting operators. */
  private def finalSection(p: String): String = {
    val i = p.indexOf("== Initial Plan ==")
    if (i >= 0) p.substring(0, i) else p
  }

  test("latest-per-key compacts with one exchange and map-side partial agg") {
    val p = finalSection(finalPlan(graft.queries.Events.evLatest(spark, sf)))
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, s"plan:\n$p")
    // struct-max plans as SortAggregate; the property that matters is
    // the partial (map-side) combine BEFORE the exchange — the shuffle
    // carries one candidate per key per partition, not every event
    assert(p.contains("partial_max(struct"),
      s"latest-per-key lost its map-side combine:\n$p")
  }

  test("IVF assignment aggregates with map-side combine, not a window") {
    val e = Tables(spark, sf, "embeddings")
    val centroids = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val p = finalSection(finalPlan(graft.operators.Similarity.ivfAssign(e, centroids)))
    assert(!p.contains("Window"), s"argmin regressed to a window:\n$p")
    assert(p.contains("partial_min(struct"), s"plan:\n$p")
  }

  test("minhash estimate computes the signature pipeline once, not per join side") {
    val df = Tables(spark, sf, "documents")
    val p = finalSection(finalPlan(graft.operators.Dedup.minhashEstimates(
      df, col("text"), col("doc_id"), 3)))
    // Signatures are the graft_minhash kernel projection (r12): the
    // exploded shingle→hash→16-min aggregation pipeline must not
    // appear anywhere — zero partial_min(pmod...) components — and
    // the kernel must not leak into a pushed-down filter (the
    // size(__sig)>0 form let predicate pushdown substitute the kernel
    // below its projection and run every document's md5 walk twice;
    // the short-doc gate is the cheap split-count predicate instead).
    // No ReusedExchange requirement: at this scale the band self-join
    // correctly BROADCASTS one side — re-running a shuffle-free
    // projection beats manufacturing an exchange to reuse.
    assert(countOccurrences(p, "partial_min(pmod") == 0,
      s"exploded signature aggregation resurfaced:\n$p")
    assert(p.contains("graft_minhash"), s"kernel signatures missing:\n$p")
    assert(!p.contains("size(graft_minhash"),
      s"kernel evaluated inside a pushed filter (double md5 walk):\n$p")
  }

  test("LSH-verified dedup reuses the shingle distinct across generator and verifier") {
    val df = Tables(spark, sf, "documents")
    val p = finalSection(finalPlan(graft.operators.Dedup.lshVerifiedPairs(
      df, col("text"), col("doc_id"), 3, 0.3)))
    // Since r12 the candidate generator runs the graft_minhash kernel
    // projection — it shares no subtree with the verify side any more
    // because it no longer HAS an exchange-heavy subtree to share
    // (the r8-r11 design shared the shingle explode+distinct through
    // ReuseExchange; the kernel removed that pipeline from the
    // generator entirely). What must still hold: the verify side's
    // per-doc shingle-set frame is materialized once and reused for
    // both pair ends, and the exploded signature aggregation is gone.
    assert(countOccurrences(p, "ReusedExchange") >= 1,
      s"shingle-set subtree not reused across the verify sides:\n$p")
    assert(p.contains("graft_minhash"), s"kernel signatures missing:\n$p")
    assert(countOccurrences(p, "partial_min(pmod") == 0,
      s"exploded signature aggregation resurfaced:\n$p")
  }

  test("semDedup computes dominance inside the block join — no pair frame") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = graft.operators.Similarity.lloydTrain(emb, 4, 2)
      .toDF("centroid_id", "cent")
    val p = plan(graft.operators.Dedup.semDedup(emb, cents, 0.3, maxCell = 50))
    // the r10 shape materialized the candidate pairs as (id_a, id_b)
    // and re-joined the assignment twice on those keys — the subtree
    // that OOM'd the 1000x rehearsal's SMJ buffer. The pair-local form
    // has no id_a/id_b attributes anywhere in the physical plan:
    assert(!p.contains("id_a") && !p.contains("id_b"),
      s"pair frame resurfaced (id_a/id_b keys in the plan):\n$p")
    // and the loser distinct partial-aggregates map-side: two
    // HashAggregates around one exchange, directly over the join
    assert(countOccurrences(p, "HashAggregate") >= 2,
      s"loser distinct lost its partial aggregation:\n$p")
  }

  test("incremental semDedup serves off the bucketed assignment — corpus read co-partitioned") {
    // the stored cell assignment is written bucketed on centroid_id;
    // the serving claim is that the cell joins exploit that layout —
    // Spark reports `Bucketed: true` on a file scan ONLY when the
    // bucket layout is actually used to satisfy the join's
    // distribution (otherwise it prints `Bucketed: false (disabled by
    // query planner)` and an Exchange re-shuffles the corpus)
    val p = finalPlan(DataOps.ddIncrementalSemdedup(spark, sf))
    assert(p.contains("ci_emb_") && p.contains("Bucketed: true"),
      s"stored assignment not read as a bucketed scan:\n$p")
    assert(!p.contains("Bucketed: false"),
      s"a bucketed table was scanned with the layout disabled:\n$p")
  }

  test("exact dedup groups on the md5 key with partial aggregation") {
    val p = plan(DataOps.ddExact(spark, sf))
    assert(p.contains("HashAggregate") &&
      countOccurrences(p, "Exchange hashpartitioning") == 1, s"plan:\n$p")
  }

  test("redirect gates broadcast their bounded frames — the corpus is " +
      "never shuffled for the redirects' sake") {
    // ds_crawl_redirects: the crawled-membership probe must be a
    // broadcast semi-join (request set broadcast INTO the corpus
    // scan), and the verdict's final join reads a broadcast of the
    // tiny fetched-finals result — zero cartesian products
    val p1 = plan(Crawl.dsCrawlRedirects(spark, sf))
    assert(p1.contains("BroadcastHashJoin") &&
      p1.contains("LeftSemi"), s"crawled probe not broadcast-semi:\n$p1")
    assert(!p1.contains("CartesianProduct"), s"plan:\n$p1")
    // ds_frontier_redirects: same posture — only the REDIRECTING
    // subset's finals are broadcast against the corpus
    val p2 = plan(Crawl.dsFrontierRedirects(spark, sf))
    assert(p2.contains("BroadcastHashJoin") &&
      p2.contains("LeftSemi"), s"finals probe not broadcast-semi:\n$p2")
    assert(!p2.contains("CartesianProduct"), s"plan:\n$p2")
  }
}
