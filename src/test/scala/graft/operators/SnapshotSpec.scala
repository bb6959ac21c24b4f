package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot diff: the three change classes, hash-based comparison,
  * unchanged suppression, and the narrow-projection plan. */
class SnapshotSpec extends SparkSpec {

  import spark.implicits._

  private val prev = Seq(
    (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"))
    .toDF("doc_id", "text")
  private val next = Seq(
    (2L, "gamma delta"), (3L, "epsilon zeta CHANGED"), (4L, "new doc"))
    .toDF("doc_id", "text")

  test("classifies added, removed, and modified; suppresses unchanged") {
    val out = Snapshot.diff(prev, next, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "modified", 4L -> "added"))
  }

  test("summary counts carry both snapshot totals") {
    val out = Snapshot.diffSummary(prev, next, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => t._1 -> t._2).toMap ==
      Map("added" -> 1L, "removed" -> 1L, "modified" -> 1L))
    assert(out.forall(t => t._3 == 3L && t._4 == 3L))
  }

  test("the join moves hashes, not text: scans project only (id, md5)") {
    val df = Snapshot.diff(prev, next, col("doc_id"), col("text"))
    df.collect()
    // text must be consumed by the md5 projection below the join —
    // no join-side output attribute carries the raw text
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case _                        => p.children.flatMap(flatten)
    })
    val joins = flatten(df.queryExecution.executedPlan)
      .filter(_.nodeName.contains("Join"))
    assert(joins.nonEmpty)
    assert(!joins.exists(_.output.exists(_.name == "text")),
      "raw text crossed the diff join")
  }
}
