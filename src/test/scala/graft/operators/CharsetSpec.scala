package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The charset front door must invert every encoding the fixture
  * plants (BOM, declaration, content sniff), never trust a lying
  * declaration into mojibake, and stay total on arbitrary bytes. */
class CharsetSpec extends SparkSpec {

  import spark.implicits._

  private def decodeBytes(rows: (Long, Array[Byte])*): Map[Long, (String, String, Boolean, Boolean)] =
    Charset.decode(rows.toDF("doc_id", "payload")
        .as[Charset.RawFetch])
      .collect()
      .map(d => d.doc_id -> ((d.text, d.charset, d.had_bom, d.was_transcoded)))
      .toMap

  test("every fixture variant decodes back to the exact page string") {
    val text = "plain ascii body words"
    val out = Charset.decode(Charset.documentsAsFetches(
        (0L to 4L).map(i => (i, text)).toDF("doc_id", "text")))
      .collect().map(d => d.doc_id ->
        ((d.text, d.charset, d.had_bom, d.was_transcoded))).toMap
    (0 to 4).foreach { v =>
      val page = Charset.syntheticEncodedPage(v, text)
      val expected = v match {
        case 0 => (page, "utf-8", false, false)
        case 1 => (page, "utf-16le", true, true)
        case 2 => (page, "iso-8859-1", false, true)
        case 3 => (page, "windows-1252", false, true)
        case _ => (page, "iso-8859-1", false, true)
      }
      assert(out(v.toLong) == expected, s"variant $v: ${out(v.toLong)}")
    }
  }

  test("a naive UTF-8 read of each transcoded variant would differ — " +
      "was_transcoded is honest") {
    val text = "body"
    (1 to 4).foreach { v =>
      val page = Charset.syntheticEncodedPage(v, text)
      val bytes = v match {
        case 1 => Array(0xff.toByte, 0xfe.toByte) ++ page.getBytes("UTF-16LE")
        case 3 => page.getBytes("windows-1252")
        case _ => page.getBytes("ISO-8859-1")
      }
      val naive = new String(bytes, "UTF-8")
      assert(naive != page,
        s"variant $v must be unreadable as naive UTF-8 or the bit is noise")
    }
  }

  test("BOM is stripped, not decoded as content; UTF-16BE handled") {
    val out = decodeBytes(
      1L -> (Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ "abc".getBytes("UTF-8")),
      2L -> (Array(0xfe.toByte, 0xff.toByte) ++ "abc".getBytes("UTF-16BE")))
    assert(out(1L) == (("abc", "utf-8", true, true)))
    assert(out(2L) == (("abc", "utf-16be", true, true)))
  }

  test("a declaration that LIES about the bytes falls back to Latin-1 " +
      "instead of minting replacement-char mojibake") {
    // declared utf-8, but the body carries a Latin-1 0xE9
    val bytes = "<meta charset=\"utf-8\"/>caf".getBytes("US-ASCII") ++
      Array(0xe9.toByte)
    val out = decodeBytes(1L -> bytes)
    val (text, cs, _, transcoded) = out(1L)
    assert(cs == "iso-8859-1" && transcoded, s"got $cs")
    assert(text.endsWith("café") && !text.contains('�'), text)
  }

  test("an unknown declared name falls through to the content sniff") {
    val utf8 = "<meta charset=\"klingon-7\"/>café".getBytes("UTF-8")
    val out = decodeBytes(1L -> utf8)
    assert(out(1L)._2 == "utf-8" && out(1L)._1.endsWith("café"))
  }

  test("declarations beyond the 1 KiB prescan window are ignored") {
    val pad = "x" * Charset.headBytes
    val bytes = (pad + "<meta charset=\"iso-8859-1\"/>").getBytes("US-ASCII")
    val out = decodeBytes(1L -> bytes)
    assert(out(1L)._2 == "utf-8", s"late declaration must not bind: ${out(1L)}")
  }

  test("total on arbitrary bytes: never throws, Latin-1 catches all") {
    val junk = Array.tabulate(256)(i => i.toByte)
    val out = decodeBytes(1L -> junk)
    assert(out(1L)._2 == "iso-8859-1" && out(1L)._1.length == 256)
  }

  test("decodedTagged carries the tag through the byte walk") {
    val rows = Seq((7L, "hi".getBytes("UTF-8"), "http://a.com/x"))
      .toDF("doc_id", "payload", "url")
    val out = Charset.decodedTagged(rows, col("payload"), col("doc_id"),
      col("url")).collect().head
    assert(out.getString(1) == "hi" && out.getString(5) == "http://a.com/x")
  }
}
