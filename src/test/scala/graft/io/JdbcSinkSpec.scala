package graft.io

import graft.SparkSpec

/** Warehouse write-back against embedded Derby — the S1 round-trip's
  * missing half (reference: src/data_processor.py:98-139 loads CSVs
  * into MySQL with TRUNCATE + executemany). Asserts semantics, not
  * mechanism: overwrite is idempotent (no duplicate accumulation, a
  * pre-created table survives with its schema), append accumulates,
  * and everything written reads back row-exact through JdbcSource. */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def frame(n: Int, offset: Int = 0) = {
    import spark.implicits._
    (1 to n).map(i => (i + offset, s"p${i + offset}", (i + offset) * 10.0))
      .toDF("id", "name", "amount")
  }

  private def readBack() =
    JdbcSource(url, "sales").load(spark)
      .selectExpr("CAST(id AS INT) AS id", "name", "CAST(amount AS DOUBLE) AS amount")

  test("overwrite writes all rows and is idempotent across reruns") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    Sinks.jdbc(frame(50), url, "sales", mode = "overwrite", batchSize = 7)
    Sinks.jdbc(frame(50), url, "sales", mode = "overwrite", batchSize = 7)
    val got = readBack().collect().map(_.toSeq).toSet
    assert(got == frame(50).collect().map(_.toSeq).toSet,
      "double overwrite must equal a single load — truncate-then-load, not accumulate")
  }

  test("append accumulates on top of the existing rows") {
    Sinks.jdbc(frame(50), url, "sales", mode = "overwrite")
    Sinks.jdbc(frame(25, offset = 100), url, "sales", mode = "append")
    assert(readBack().count() == 75)
    assert(readBack().where("id > 100").count() == 25)
  }

  test("maxConnections caps the write's partition fan-in, not its rows") {
    Sinks.jdbc(frame(200).repartition(16), url, "sales",
      mode = "overwrite", maxConnections = Some(2))
    assert(readBack().count() == 200)
  }
}
