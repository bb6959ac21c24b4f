package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bloom prune's contract: result-invisible (no false negatives),
  * genuinely pruning (fact rows drop before the join), and built from
  * codegen'd Catalyst natives (might_contain in the executed plan —
  * no UDF). */
class BloomSemiJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pruned join returns exactly the plain join's rows") {
    val li = Tables(spark, sf, "lineitem")
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000)
      .select("o_orderkey", "o_orderpriority")
    val pruned = BloomSemiJoin.prunedJoin(li, dim, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(_.toSeq).toSet
    assert(plain.nonEmpty, "fixture should produce matches")
    assert(pruned == plain, "bloom prune must be row-invisible")
  }

  test("the filter actually prunes: surviving fact rows ≪ fact, ≥ matches") {
    val li = Tables(spark, sf, "lineitem")
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000).select("o_orderkey")
    val bloom = BloomSemiJoin.buildFilter(dim, col("o_orderkey"), 10000L, 1L << 20)
    val factN = li.count()
    val surviving = li.filter(BloomSemiJoin.mightContain(bloom, col("l_orderkey"))).count()
    val matching = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(surviving >= matching, "a bloom filter can never reject a real match")
    assert(surviving < factN / 2,
      s"selective dim should prune most fact rows (fact=$factN survived=$surviving)")
  }

  test("might_contain is in the executed plan (native expression, pre-join)") {
    val li = Tables(spark, sf, "lineitem")
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000).select("o_orderkey")
    val plan = BloomSemiJoin.prunedJoin(li, dim, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected might_contain in plan:\n$plan")
  }

  test("the bloom filter sits BELOW any exchange — rows drop before they shuffle") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val li = Tables(spark, sf, "lineitem")
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 300000).select("o_orderkey")
    val top = BloomSemiJoin.prunedJoin(li, dim, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan
    // AQE wraps the physical plan; collect() does not descend into it
    val planned = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val bloomFilters = planned.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, s"no bloom FilterExec found in:\n$planned")
    bloomFilters.foreach { f =>
      assert(f.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        "the prune must run scan-side; an exchange below it means rows shuffled unpruned")
    }
  }

  test("empty dim side rejects everything without error") {
    val li = Tables(spark, sf, "lineitem")
    val dim = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 99999999).select("o_orderkey")
    assert(BloomSemiJoin.prunedJoin(li, dim, "l_orderkey", "o_orderkey").count() == 0)
  }
}
