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

  private def indexScans(nodes: Seq[SparkPlan]): Seq[FileSourceScanExec] =
    nodes.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("corpus_index")) => s
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

  test("probe plan: bucketed index scans, zero exchange above any corpus-index scan") {
    // force the join shapes the claim is about — at corpus scale no
    // index side fits a broadcast, so disable it rather than assert
    // against the tiny-test-data plan AQE would pick
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = DataOps.ddIncrementalPersisted(spark, sf)
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      val scans = indexScans(nodes)
      // all three index tables participate (md5s, buckets, shingle sets)
      assert(scans.size >= 3, s"expected >=3 corpus-index scans, got ${scans.size}")
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
}
