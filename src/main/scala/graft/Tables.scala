package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loader for the harness star schema
  * (TESTDATA.md: region nation customer supplier part orders lineitem
  * events documents embeddings — one parquet file each).
  *
  * At 100 TB these would be directory-partitioned tables behind a
  * catalog; a single `spark.read.parquet` on a directory scales the
  * same way (file listing + split planning is distributed), so the
  * loader API stays identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with `ts` normalized to a NANOSECOND epoch Long
    * regardless of how the parquet spells it — harness data has
    * shipped both TIMESTAMP(NANOS) (a Long under nanosAsLong) and
    * timestamp[us]. A naive (NTZ) timestamp casts through TIMESTAMP
    * so it is read in the UTC session zone, the same reading DuckDB's
    * `epoch_us` gives the oracle. */
  def eventsNanos(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
}
