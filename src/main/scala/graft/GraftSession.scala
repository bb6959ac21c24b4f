package graft

import org.apache.spark.sql.SparkSession

/** Engine session factory: one place for the configuration the
  * engine's correctness and scale posture depend on — UTC session
  * time, shuffle parallelism = local cores (32 on the harness, set
  * `spark.sql.shuffle.partitions` to cluster-appropriate values in a
  * real deployment), nanosecond-parquet handling, small-file split
  * tuning for the MB-scale local test data, and the graft function +
  * optimizer-rule registration (FloatVectorDot / RewriteVectorDot).
  */
object GraftSession {

  def create(appName: String,
             cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
               Runtime.getRuntime.availableProcessors().toString),
             maxPartitionBytes: String = "4m"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      // ObjectHashAggregate silently degrades to SORT-BASED aggregation
      // after 128 distinct keys per task (the default fallback
      // threshold) — which re-imposes exactly the full per-partition
      // sort that bounded-buffer aggregates like TopKByValue exist to
      // avoid (measured: the 1000× rehearsal's topk_agg matched the
      // window sort's cost instead of beating it). Our typed aggregates
      // all carry O(k) buffers, so hash mode's memory is keys×k pairs —
      // raise the threshold so they stay hash-based.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.ensureRegistered(spark)
    spark
  }
}
