package graft.operators

import graft.SparkSpec
import graft.queries.DataOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** The persisted CorpusIndex exists for one claim: incremental dedup
  * probes STORED corpus state and shuffles only the batch side. This
  * spec pins (a) result identity with the in-plan index, (b) the
  * plan shape — every index table is read as a bucketed scan and no
  * exchange of any kind sits above a corpus-index scan.
  */
class DedupIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Flatten the executed plan across AQE stage/reuse wrappers. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case _                        => p.children.flatMap(flatten)
    })

  /** Corpus-index scans, EXCLUDING the stored centroid table: k
    * centroids are model state the assignment broadcasts by design —
    * the batch-only-shuffle contract is about corpus-sized frames. */
  private def indexScans(nodes: Seq[SparkPlan]): Seq[FileSourceScanExec] =
    nodes.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists { p =>
          p.toString.contains("corpus_index") &&
            !p.toString.contains("embed_centroids")
        } => s
    }

  /** Index scans reachable from `p` WITHOUT crossing a join: an
    * exchange with such a scan would be re-shuffling raw corpus-index
    * data. Scans below a join are fine — exchanges above a join move
    * already-joined (batch-sized) frames, which is the design. */
  private def scansBeforeJoin(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansBeforeJoin(a.executedPlan)
    case q: QueryStageExec        => scansBeforeJoin(q.plan)
    case r: ReusedExchangeExec    => scansBeforeJoin(r.child)
    case _: org.apache.spark.sql.execution.joins.BaseJoinExec => Nil
    case s: FileSourceScanExec    => indexScans(Seq(s))
    case other                    => other.children.flatMap(scansBeforeJoin)
  }

  test("persisted-index probe returns exactly the in-plan incremental result") {
    val inPlan = DataOps.ddIncremental(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val persisted = DataOps.ddIncrementalPersisted(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(persisted == inPlan)
    assert(persisted.nonEmpty)
  }

  /** Shared probe-shape assertion: every scan of a bucketed index
    * table (path containing `bucketedMarker`) is a bucketed scan that
    * reaches its first join exchange-free. Tables under
    * `broadcastOk` markers (the tiny centroid table an assignment
    * legitimately broadcasts) are exempt. */
  private def assertBatchOnlyShuffle(df: org.apache.spark.sql.DataFrame,
                                     minScans: Int): Unit = {
    // force the join shapes the claim is about — at corpus scale no
    // index side fits a broadcast, so disable it rather than assert
    // against the tiny-test-data plan AQE would pick
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      val scans = indexScans(nodes)
      assert(scans.size >= minScans,
        s"expected >=$minScans corpus-index scans, got ${scans.size}")
      assert(scans.forall(_.bucketedScan),
        "every corpus-index read must be a bucketed scan")
      // no shuffle and no broadcast materialization of corpus state:
      // every index scan must reach its first join exchange-free, so
      // only |batch|-sided frames cross exchanges
      val exchanges = nodes.collect {
        case e: ShuffleExchangeExec   => e
        case e: BroadcastExchangeExec => e
      }
      exchanges.foreach { e =>
        assert(e.children.flatMap(scansBeforeJoin).isEmpty,
          s"corpus-index scan fed into an exchange before any join:\n$e")
      }
      assert(exchanges.nonEmpty, "sanity: the batch side does shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("probe plan: bucketed index scans, zero exchange above any corpus-index scan") {
    // all three index tables participate (md5s, buckets, shingle sets)
    assertBatchOnlyShuffle(DataOps.ddIncrementalPersisted(spark, sf), minScans = 3)
  }

  test("simhash persisted probe equals the in-plan form, batch-only shuffle") {
    val inPlan = DataOps.ddIncrementalSimhash(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val persisted = DataOps.ddIncrementalSimhashPersisted(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(persisted == inPlan && persisted.nonEmpty)
    assertBatchOnlyShuffle(DataOps.ddIncrementalSimhashPersisted(spark, sf), minScans = 1)
  }

  test("embedding persisted probe equals the in-plan form, batch-only shuffle") {
    val inPlan = DataOps.ddIncrementalEmbed(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val persisted = DataOps.ddIncrementalEmbedPersisted(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(persisted == inPlan && persisted.nonEmpty)
    // the bucketed assignment table is the corpus state under the
    // contract; the k-row stored centroid table broadcasts by design
    // (excluded in indexScans)
    assertBatchOnlyShuffle(DataOps.ddIncrementalEmbedPersisted(spark, sf), minScans = 1)
  }
}
