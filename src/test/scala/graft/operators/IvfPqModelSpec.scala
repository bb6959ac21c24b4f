package graft.operators

import graft.SparkSpec
import graft.queries.DataOps
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** The persisted IVFADC model: serving from the stored tables must
  * equal the live train→encode→search path bit-for-bit, the code
  * frame must be read as a bucketed scan, and a fresh serving
  * session must answer with zero training jobs. */
class IvfPqModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case _                        => p.children.flatMap(flatten)
    })

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("persisted-model probe equals the live IVFADC path") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val live = rows(Similarity.ivfPqAdcTopK(
      e, e.filter(col("vec_id") < DataOps.annQueries),
      DataOps.lloydK, DataOps.lloydIters, DataOps.pqM, DataOps.pqK,
      DataOps.pqIters, DataOps.ivfpqNprobe, DataOps.annK))
    val stored = rows(DataOps.simIvfPqPersisted(spark, sf))
    assert(stored == live)
    assert(stored.nonEmpty)
  }

  test("the code frame is read as a bucketed scan") {
    val df = DataOps.simIvfPqPersisted(spark, sf)
    df.collect()
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("ivfpq/codes")) => s
    }
    assert(scans.nonEmpty, "no codes-table scan in the probe plan")
    assert(scans.forall(_.bucketedScan), "codes must be read as a bucketed scan")
  }

  test("a fresh serving session probes the stored model without training") {
    // ensure the model exists (training may run here, once)
    DataOps.simIvfPqPersisted(spark, sf).collect()
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    // a child session sees the same catalog; serving = load + probe.
    // Zero Lloyd jobs: lloydTrain collects on the driver — we assert
    // no job ran by routing through ensureIvfPqModel with a corpus
    // thunk that THROWS if forced.
    val serving = spark.newSession()
    val (codes, cents, books) = Similarity.ensureIvfPqModel(serving,
      s"${DataOps.tableRoot}/$tag/ivfpq", tag,
      { throw new IllegalStateException("serving session must not train") },
      DataOps.lloydK, DataOps.lloydIters, DataOps.pqM, DataOps.pqK,
      DataOps.pqIters, DataOps.bucketCount)
    val q = serving.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < DataOps.annQueries)
    val got = rows(Similarity.ivfPqProbe(codes, cents, books, q,
      Similarity.lshDims / DataOps.pqM, DataOps.ivfpqNprobe, DataOps.annK))
    val want = rows(DataOps.simIvfPqPersisted(spark, sf))
    assert(got == want)
  }
}
