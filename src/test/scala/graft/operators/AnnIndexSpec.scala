package graft.operators

import graft.SparkSpec
import graft.queries.DataOps
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes exist so a probe query costs |Q| work, not
  * an index rebuild: the corpus side must be a bucketed table scan
  * with no hyperplane/assignment math and no exchange above it, and
  * the answers must equal the live-corpus operators exactly.
  */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case _                        => p.children.flatMap(flatten)
    })

  private def indexScans(nodes: Seq[SparkPlan], marker: String): Seq[FileSourceScanExec] =
    nodes.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(marker)) => s
    }

  /** Index scans reachable without crossing a join — an exchange with
    * one would be re-shuffling raw index data (post-join exchanges
    * move |Q|-sized frames and are fine). */
  private def scansBeforeJoin(p: SparkPlan, marker: String): Seq[FileSourceScanExec] =
    p match {
      case a: AdaptiveSparkPlanExec => scansBeforeJoin(a.executedPlan, marker)
      case q: QueryStageExec        => scansBeforeJoin(q.plan, marker)
      case r: ReusedExchangeExec    => scansBeforeJoin(r.child, marker)
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => Nil
      case s: FileSourceScanExec    => indexScans(Seq(s), marker)
      case other                    => other.children.flatMap(scansBeforeJoin(_, marker))
    }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  private def assertProbeShape(df: org.apache.spark.sql.DataFrame, marker: String): Unit = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      val scans = indexScans(nodes, marker)
      assert(scans.nonEmpty, s"no $marker table scan in the probe plan")
      assert(scans.forall(_.bucketedScan), s"$marker must be read as a bucketed scan")
      // rebuild-free: the index subtree is scan(+filter/project) only —
      // no vector math between the scan and its join (the scan's own
      // columns already carry bucket and nrm)
      nodes.collect {
        case e: ShuffleExchangeExec   => e
        case e: BroadcastExchangeExec => e
      }.foreach { e =>
        assert(e.children.flatMap(scansBeforeJoin(_, marker)).isEmpty,
          s"$marker scan fed into an exchange before any join:\n$e")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("persisted sign-LSH index probe equals lshAnnFor over the live corpus") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val live = rows(Similarity.lshAnnFor(
      e, e.filter(col("vec_id") < DataOps.annQueries), DataOps.annK))
    val stored = rows(DataOps.simAnnPersisted(spark, sf))
    assert(stored == live)
    assert(stored.nonEmpty)
  }

  test("sign-LSH probe scans the stored index: bucketed, exchange-free, no rebuild") {
    assertProbeShape(DataOps.simAnnPersisted(spark, sf), "ann_index")
  }

  test("persisted IVF index probe equals assign-then-rerank over the live corpus") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val centroids = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val live = rows(Similarity.ivfProbe(
      Similarity.ivfIndexFrame(e, centroids), centroids,
      e.filter(col("vec_id") < DataOps.annQueries), DataOps.annK))
    val stored = rows(DataOps.simIvfPersisted(spark, sf))
    assert(stored == live)
    assert(stored.nonEmpty)
  }

  test("IVF probe scans the stored index: bucketed, exchange-free, no rebuild") {
    assertProbeShape(DataOps.simIvfPersisted(spark, sf), "ivf_index")
  }
}
