package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The staging primitive's contract (GraftBridge.stageLocal): a
  * checkpointed frame must carry NO origin constraints, because
  * `Dataset.localCheckpoint` stamps the LogicalRDD with the optimized
  * plan's constraints on the ORIGINAL exprIds — and when another frame
  * in the same query shares those source attributes,
  * InferFiltersFromConstraints re-applies them to ITS operators
  * (measured: a batch-side `id >= cut OR id <=> planted` union
  * constraint was injected into the corpus-side scan of the same
  * dominance query, silently emptying the corpus join — caught by
  * IncrementalDedupSpec; this spec pins the mechanism directly). */
class StageLocalSpec extends SparkSpec {

  import spark.implicits._

  test("a staged frame does not leak its lineage constraints into sibling frames") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stage").toString
    (0L until 100L).map(i => (i, i % 7)).toDF("id", "grp")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    // batch: a filtered slice UNIONed with a literal-id row — the plan
    // shape whose union constraint (id >= 50 OR id <=> 900) poisoned
    // the sibling scan under Dataset.localCheckpoint
    val batch = GraftBridge.stageLocal(
      src.filter(col("id") >= 50)
        .unionByName(src.limit(1).select(lit(900L).as("id"), col("grp"))))
    // sibling: the SAME source, complementary filter
    val corpus = src.filter(col("id") < 50)
    val joined = batch.as("b").join(corpus.as("c"),
        col("b.grp") === col("c.grp"))
      .select(col("b.id").as("b_id"), col("c.id").as("c_id"))
    // every batch row has grp-mates below the cut: 51 batch rows × ~7
    // corpus mates each — a poisoned corpus scan returns 0 rows total
    val n = joined.count()
    assert(n > 300, s"corpus side of the join was emptied (got $n rows) — " +
      "staged-frame constraints leaked into the sibling scan")
    // and the staged plan itself carries no inferred corpus-side filter
    val scanFilters = joined.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.sql
    }
    assert(!scanFilters.exists(c => c.contains("900")),
      s"planted batch constraint reached a sibling filter: $scanFilters")
  }

  test("staging preserves rows, schema, and values exactly") {
    val df = (0L until 1000L).map(i => (i, s"t$i", i * 0.5)).toDF("id", "s", "x")
      .filter(col("id") % 3 === 0)
    val staged = GraftBridge.stageLocal(df)
    assert(staged.schema == df.schema)
    assert(staged.collect().map(_.toString).sorted.toSeq
      == df.collect().map(_.toString).sorted.toSeq)
  }

  test("releaseStaged unpersists the checkpoint blocks at a consume boundary") {
    GraftBridge.releaseStaged() // clear anything earlier tests staged
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val staged = GraftBridge.stageLocal(
      (0L until 500L).map(i => (i, i % 3)).toDF("id", "grp"))
    assert(staged.count() == 500)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty, "stageLocal should pin checkpoint blocks")
    GraftBridge.releaseStaged()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(pinned.forall(!after.contains(_)),
      s"staged RDDs survived releaseStaged: ${pinned.intersect(after)}")
  }
}
