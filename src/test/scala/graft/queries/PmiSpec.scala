package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PMI association laws on a constructed corpus. */
class PmiSpec extends SparkSpec {

  test("an always-together pair outranks an independent one; ln algebra is exact") {
    import spark.implicits._
    // "strong glue" always adjacent (PMI high); "a" pairs with many
    // successors (PMI ~ 0 or below); every pair count >= minCount
    val docs = (1 to 10).flatMap { i =>
      Seq(s"strong glue a x$i", s"a y${i % 2} strong glue")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // piggyback on the registered query's algebra via a temp dir? No:
    // apply the operator body through DataOps by writing a parquet table
    val dir = java.nio.file.Files.createTempDirectory("pmi").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = DataOps.txPmi(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(out.contains(("strong", "glue")), s"pairs found: ${out.keys}")
    val glue = out(("strong", "glue"))
    assert(glue == out.values.max,
      s"the deterministic collocation ranks at the top: $out")
    // "glue a": glue's successor varies (a half the time) -> lower PMI
    assert(out(("glue", "a")) < glue, s"varied successor must rank below: $out")
    // exact replay of the formula for the glue pair: c12=20, c1=c2=20,
    // T=80 tokens, P=60 pairs
    val expected = math.round(1e6 *
      (math.log(20) - math.log(60) - math.log(20) - math.log(20)
        + 2 * math.log(80)))
    assert(glue == expected, s"glue PMI $glue != hand-computed $expected")
  }
}
