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
}
