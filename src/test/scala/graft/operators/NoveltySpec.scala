package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Novelty-score laws on planted duplicate / unique documents. */
class NoveltySpec extends SparkSpec {

  test("verbatim duplicates score 0; an isolated vocabulary scores 1e6") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (0L, shared), (1L, shared), // verbatim twins: every gram df >= 2
      (2L, (1 to 12).map(i => s"own$i").mkString(" ")), // fully unique
      (3L, s"$shared ${(1 to 8).map(i => s"extra$i").mkString(" ")}")
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(docs, col("text"), col("doc_id"), n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(0L)._3 == 0L && out(1L)._3 == 0L,
      s"twins share every gram: $out")
    assert(out(2L)._3 == 1000000L, s"isolated vocabulary is fully novel: $out")
    // doc 3 shares its prefix grams with the twins but owns its tail
    val (n3, u3, ppm3) = out(3L)
    assert(u3 > 0 && u3 < n3 && ppm3 == u3 * 1000000L / n3, s"doc 3: $out")
  }

  test("documents shorter than n tokens carry no score row") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "a b c d e f")).toDF("doc_id", "text")
    val ids = Dedup.noveltyScores(docs, col("text"), col("doc_id"), n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }
}
