package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-source data card: counts, dup rate, dominant-language argmax. */
class DatacardSpec extends SparkSpec {

  import spark.implicits._

  test("volume, duplication, and language columns match the hand count") {
    val docs = Seq(
      (1L, "a b c d", "en", "wiki"),
      (2L, "a b c d", "en", "wiki"),   // exact dup of 1
      (3L, "b a d c e f", "de", "wiki"),
      (4L, "a b a b", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val ref = Seq("a b c a b d").toDF("text")
    val out = Profile.datacard(docs, col("text"), col("doc_id"), ref)
      .collect().map(r => r.getString(0) -> r).toMap

    val wiki = out("wiki")
    assert(wiki.getLong(1) == 3L)                  // n_docs
    assert(wiki.getLong(2) == 14L)                 // n_tokens 4+4+6
    assert(wiki.getDouble(3) == 4.67)              // avg rounded 2dp
    assert(wiki.getDouble(4) == math.rint(1e6 / 3) / 1e6) // 1 dup of 3
    assert(wiki.getString(7) == "en")              // 2 en vs 1 de

    val web = out("web")
    assert(web.getLong(1) == 1L && web.getDouble(4) == 0.0)
    assert(web.getString(7) == "en")
  }

  test("dominant-language ties break to the lexicographically greatest lang") {
    val docs = Seq(
      (1L, "a b", "en", "s"), (2L, "a b c", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val ref = Seq("a b").toDF("text")
    val out = Profile.datacard(docs, col("text"), col("doc_id"), ref).collect()
    assert(out.length == 1 && out(0).getString(7) == "en")
  }
}
