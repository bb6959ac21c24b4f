package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-window chunker: window arithmetic, tail handling, coverage. */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(text: String, c: Int, o: Int): Seq[(Int, Int, String)] =
    Chunking.chunk(Seq(1L -> text).toDF("doc_id", "text"),
        col("text"), col("doc_id"), c, o)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq

  test("windows start every stride tokens and the tail runs short") {
    // 11 tokens, C=4, O=1 → stride 3 → 4 chunks, last has 2 tokens
    val out = chunksOf("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11", 4, 1)
    assert(out == Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10"),
      (3, 2, "t10 t11")))
  }

  test("a document at or under the window is a single chunk") {
    assert(chunksOf("a b c", 4, 1) == Seq((0, 3, "a b c")))
    assert(chunksOf("a b c d", 4, 1) == Seq((0, 4, "a b c d")))
  }

  test("exact multiple of stride ends on a full window") {
    // 10 tokens, C=4, stride 3 → chunks at 1,4,7 — position 10 falls
    // in the tail window which is exactly the last stride's worth
    val out = chunksOf("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 1)
    assert(out.map(_._1) == Seq(0, 1, 2) && out.last._3 == "t7 t8 t9 t10")
  }

  test("every token position is covered by at least one chunk") {
    for (len <- Seq(1, 5, 47, 48, 49, 64, 65, 200)) {
      val text = (1 to len).map(i => s"w$i").mkString(" ")
      val covered = chunksOf(text, 64, 16).flatMap(_._3.split(" ")).toSet
      assert(covered == (1 to len).map(i => s"w$i").toSet, s"len=$len")
    }
  }
}
