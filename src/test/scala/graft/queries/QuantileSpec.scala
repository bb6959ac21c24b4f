package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact counting-sort quantiles: nearest-rank law on a hand fixture
  * and agreement with a reference sort at corpus scale. */
class QuantileSpec extends SparkSpec {

  test("nearest-rank selection on a hand-computed distribution") {
    import spark.implicits._
    // lang x: lengths 1..10 once each -> p50 = 5th smallest = 5,
    // p90 = 9, p99 = ceil(9.9) = 10th = 10
    // lang y: ten 3s and one 100 -> p50 = 3, p90 = 3 (10th of 11), p99 = 100
    val rows = (1 to 10).map(n => ("x", ("w " * n).trim)) ++
      (1 to 10).map(_ => ("y", "a b c")) ++ Seq(("y", ("z " * 100).trim))
    val df = rows.toDF("lang", "text")
    // same algebra as the registered query, applied to the fixture
    val counts = df.select(col("lang"), size(split(col("text"), " ")).as("len"))
      .groupBy("lang", "len").agg(count(lit(1)).as("c"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("lang")))
    val qs = DataOps.quantileQs.map { case (name, q) =>
      min(when(col("cum") * 100 >= col("n") * q, col("len")))
        .cast("long").as(name)
    }
    val out = cum.groupBy("lang").agg(qs.head, qs.tail: _*)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("x") == ((5L, 9L, 10L)), s"x: ${out("x")}")
    assert(out("y") == ((3L, 3L, 100L)), s"y: ${out("y")}")
  }

  test("agrees with a sorted nearest-rank reference on real data") {
    val sf = "/root/testdata/sf0.001"
    val got = DataOps.dsLengthQuantiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val lens = graft.Tables(spark, sf, "documents")
      .select(col("lang"), size(split(col("text"), " ")).as("len"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    lens.foreach { case (lang, sorted) =>
      def nr(q: Int): Long = sorted((q * sorted.length + 99) / 100 - 1).toLong
      assert(got(lang) == ((nr(50), nr(90), nr(99))),
        s"$lang: got ${got(lang)}, reference (${nr(50)}, ${nr(90)}, ${nr(99)})")
    }
  }
}
