package graft.io

import graft.SparkSpec

/** Partitioned JDBC ingest against an embedded Derby database (the
  * JDBC driver ships with Spark's jars — no egress). Verifies the
  * fix for the reference's single-partition JDBC scan: the read
  * plans one input partition per declared range, and partitioning
  * never changes the row set. */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, "CUSTOMERS", null)
      if (!meta.next()) {
        conn.createStatement()
          .execute("CREATE TABLE customers (id INT, name VARCHAR(32), region INT)")
        val ps = conn.prepareStatement("INSERT INTO customers VALUES (?, ?, ?)")
        (1 to 100).foreach { i =>
          ps.setInt(1, i); ps.setString(2, s"c$i"); ps.setInt(3, i % 5); ps.addBatch()
        }
        ps.executeBatch()
      }
    } finally conn.close()
  }

  test("partitioned read plans numPartitions ranges with full row parity") {
    seed()
    val partitioned = JdbcSource(url, "customers",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 101L,
      numPartitions = 4).load(spark)
    assert(partitioned.rdd.getNumPartitions == 4,
      s"expected 4 input partitions, got ${partitioned.rdd.getNumPartitions}")

    val single = JdbcSource(url, "customers").load(spark)
    assert(single.rdd.getNumPartitions == 1)

    val p = partitioned.collect().map(_.toSeq).toSet
    val s = single.collect().map(_.toSeq).toSet
    assert(p.size == 100 && p == s, "partitioned read must not change the row set")
  }

  test("derivedBounds probes MIN/MAX with a pushed-down 1-row query") {
    seed()
    assert(JdbcSource.derivedBounds(spark, url, "customers", "id") == ((1L, 100L)))
  }

  test("rows outside the declared bounds still arrive (stride edges unbounded)") {
    seed()
    val narrow = JdbcSource(url, "customers",
      partitionColumn = Some("id"), lowerBound = 40L, upperBound = 60L,
      numPartitions = 3).load(spark)
    assert(narrow.count() == 100, "bounds shape parallelism, never filter rows")
  }
}
