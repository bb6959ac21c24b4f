package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSource V2 connector: correctness, connector-level partition
  * pruning (a day predicate must plan only the matching files), and
  * column pruning. */
class DayFileSourceSpec extends SparkSpec {

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("dayfiles").toString
    def write(day: Int, rows: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"day=$day.csv"),
        rows.mkString("\n").getBytes)
    write(1, Seq("101,1.5", "102,2.5"))
    write(2, Seq("201,3.0"))
    write(3, Seq("301,4.0", "302,5.0", "303,6.0"))
    dir
  }

  private def load(dir: String) =
    spark.read.format("graft.io.DayFileSource")
      .schema(DayFileSource.defaultSchema).load(dir)

  test("reads all day files with day as a partition-derived column") {
    val got = load(fixture()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1, 101L, 1.5), (1, 102L, 2.5), (2, 201L, 3.0),
      (3, 301L, 4.0), (3, 302L, 5.0), (3, 303L, 6.0)))
  }

  test("day predicates prune files at the connector, not post-scan") {
    val dir = fixture()
    val q = load(dir).filter(col("day") >= 2)
    assert(q.count() == 4)
    // the scan plans only the surviving partitions
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scans.contains("prunedTo=2 files"), s"plan:\n$scans")
    val eq = load(dir).filter(col("day") === 1)
    assert(eq.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString.contains("prunedTo=1 files"))
    assert(eq.collect().map(_.getLong(1)).sorted.toSeq == Seq(101L, 102L))
  }

  test("column pruning narrows the read schema") {
    val q = load(fixture()).select("id")
    assert(q.schema.fieldNames.toSeq == Seq("id"))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(101L, 102L, 201L, 301L, 302L, 303L))
  }
}
