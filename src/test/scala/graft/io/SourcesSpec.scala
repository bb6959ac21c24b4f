package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Malformed-input policy of the CSV source: quarantine (PERMISSIVE +
  * corrupt-record capture), drop, and fail-fast — ingest at scale
  * must choose explicitly, not discover rot 90 TB in. */
class SourcesSpec extends SparkSpec {

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("csv_bad").toString
    val f = java.nio.file.Paths.get(dir, "rows.csv")
    java.nio.file.Files.write(f,
      "id,qty\n1,10\nnot_a_number,oops\n3,30\n".getBytes)
    dir
  }

  private val base = StructType(Seq(
    StructField("id", LongType), StructField("qty", LongType)))

  test("PERMISSIVE captures the malformed row in _corrupt_record") {
    val dir = writeFixture()
    val schema = base.add(StructField("_corrupt_record", StringType))
    val df = CsvSource(dir, schema).load(spark).cache()
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad(0).getAs[String]("_corrupt_record")
      .startsWith("not_a_number"))
    assert(df.filter(col("id").isNotNull).count() == 2)
    df.unpersist()
  }

  test("DROPMALFORMED silently drops the bad row") {
    val dir = writeFixture()
    val df = CsvSource(dir, base, Map("mode" -> "DROPMALFORMED")).load(spark)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("FAILFAST surfaces the malformed row as an error") {
    val dir = writeFixture()
    val df = CsvSource(dir, base, Map("mode" -> "FAILFAST")).load(spark)
    intercept[org.apache.spark.SparkException] { df.collect() }
  }
}
