package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fetch-boundary MIME router: every planted container posture
  * routes to its pipeline, the heuristics fire only after every magic
  * fails, and unknown bytes land in the never-wrong octet bucket. */
class MimeSniffSpec extends SparkSpec {

  import spark.implicits._

  private def sniff(rows: (Long, Array[Byte])*): Map[Long, String] =
    rows.toDF("id", "payload")
      .select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("all seven fixture postures route to their pipeline") {
    val out = Multimodal.documentsAsMixedPayloads(
        (0L to 6L).map(i => (i, "some words here for the payload"))
          .toDF("doc_id", "text")).toDF()
      .select(col("media_id"), Multimodal.sniffMime(col("payload")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "image/png", 1L -> "image/jpeg",
      2L -> "audio/wav", 3L -> "text/html", 4L -> "text/plain",
      5L -> "application/gzip", 6L -> "application/pdf"), s"$out")
  }

  test("heuristics: whitespace-led markup is html, printable bytes " +
      "are text, anything else is octet-stream — never a wrong guess") {
    val out = sniff(
      1L -> "\n\t  <div>late html</div>".getBytes("UTF-8"),
      2L -> "just words, digits 123 and (punct.)".getBytes("UTF-8"),
      3L -> Array[Byte](0, 1, 2, -1, -2),              // control + high bytes
      4L -> "text with a stray é".getBytes("ISO-8859-1"), // 0xE9
      5L -> "RIFF1234FAKE".getBytes("US-ASCII"),       // RIFF but not WAVE
      6L -> Array(0xff.toByte, 0xd8.toByte))           // truncated JPEG SOI
    assert(out(1L) == "text/html" && out(2L) == "text/plain")
    assert(out(3L) == "application/octet-stream")
    assert(out(4L) == "application/octet-stream",
      "a non-ASCII byte must not pass the printable-text check — " +
        "charset detection, not the router, owns that call")
    assert(out(5L) == "text/plain", "RIFF without WAVE is not audio; " +
      "its bytes are printable, so the text fallback may claim it")
    assert(out(6L) == "application/octet-stream",
      "a 2-byte SOI is not the 3-byte JPEG magic")
  }

  test("container magic outranks content: a PNG whose payload is html " +
      "stays an image; a PDF header beats the text heuristic") {
    val out = sniff(
      1L -> Multimodal.pngContainer(4, 4, "<html>inside</html>".getBytes),
      2L -> "%PDF-1.7 then printable text".getBytes("US-ASCII"))
    assert(out(1L) == "image/png" && out(2L) == "application/pdf", s"$out")
  }
}
