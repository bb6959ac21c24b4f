package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WARC walk must invert the record builder byte-for-byte, fail
  * loudly on truncation, split HTTP envelopes exactly, and — the load-
  * bearing law — feed the crawl front door the SAME answer the
  * fixture-frame path computes (the ds_crawl_warc oracle row gates
  * the same equivalence at sf0.01 every round). */
class WarcSpec extends SparkSpec {

  import spark.implicits._

  private def blob(id: Long, recs: Array[Byte]*): Warc.WarcBlob =
    Warc.WarcBlob(id, recs.reduce(_ ++ _))

  test("multi-record walk: types, ids, URIs, payloads round-trip") {
    val b = blob(0L,
      Warc.record("warcinfo", "urn:x:info", None, "meta\r\n".getBytes),
      Warc.record("request", "urn:x:req:1", Some("http://a.com/p"),
        "GET / HTTP/1.1\r\n\r\n".getBytes),
      Warc.record("response", "urn:x:resp:1", Some("http://a.com/p"),
        "HTTP/1.1 200 OK\r\n\r\nbody bytes".getBytes))
    val out = Warc.records(Seq(b).toDS()).collect().sortBy(_.rec_idx)
    assert(out.map(_.warc_type).toSeq == Seq("warcinfo", "request", "response"))
    assert(out.map(_.record_id).toSeq ==
      Seq("urn:x:info", "urn:x:req:1", "urn:x:resp:1"))
    assert(out(0).target_uri == null && out(1).target_uri == "http://a.com/p")
    assert(new String(out(2).payload) == "HTTP/1.1 200 OK\r\n\r\nbody bytes")
    assert(out(2).content_length == out(2).payload.length.toLong)
  }

  test("unknown headers are skipped; binary payloads (CRLFs inside) " +
      "survive Content-Length slicing") {
    val payload = "line1\r\n\r\nWARC/1.0 fake header inside payload\r\n"
      .getBytes ++ Array[Byte](0, 1, 2, -1)
    val rec = {
      // splice an unknown header before the blank line
      val r = Warc.record("resource", "urn:x:r", None, payload)
      val s = new String(r, "ISO-8859-1")
      val at = s.indexOf("Content-Length:")
      (s.substring(0, at) + "WARC-Block-Digest: sha1:abc\r\n" +
        s.substring(at)).getBytes("ISO-8859-1")
    }
    val out = Warc.records(Seq(Warc.WarcBlob(1L, rec)).toDS()).collect()
    assert(out.length == 1 && out(0).payload.sameElements(payload))
  }

  test("truncated payload fails loudly, never a silent partial record") {
    val full = Warc.record("resource", "urn:x:t", None, "0123456789".getBytes)
    val cut = full.dropRight(6) // payload tail + separator gone
    val e = intercept[org.apache.spark.SparkException] {
      Warc.records(Seq(Warc.WarcBlob(2L, cut)).toDS()).collect()
    }
    assert(e.getMessage.contains("truncated") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")))
  }

  test("httpResponses: status off the status line, body after the " +
      "first blank line, request/warcinfo records excluded") {
    val b = blob(3L,
      Warc.record("warcinfo", "urn:x:i", None, "m\r\n".getBytes),
      Warc.record("request", "urn:x:q", Some("http://h.com/"),
        "GET / HTTP/1.1\r\n\r\n".getBytes),
      Warc.record("response", "urn:x:s", Some("http://h.com/"),
        "HTTP/1.1 404 Not Found\r\nX: y\r\n\r\n<html>gone</html>".getBytes))
    val out = Warc.httpResponses(Warc.records(Seq(b).toDS())).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("url") == "http://h.com/")
    assert(r.getAs[Int]("http_status") == 404)
    assert(new String(r.getAs[Array[Byte]]("body")) == "<html>gone</html>")
  }

  test("non-200 responses never feed the front door: the status gate " +
      "drops error pages before decode") {
    val b = blob(4L,
      Warc.record("response", "urn:x:ok", Some("http://h.com/ok"),
        "HTTP/1.1 200 OK\r\n\r\n<html>good</html>".getBytes),
      Warc.record("response", "urn:x:gone", Some("http://h.com/gone"),
        "HTTP/1.1 404 Not Found\r\n\r\n<html>error page</html>".getBytes),
      Warc.record("response", "urn:x:boom", Some("http://h.com/boom"),
        "HTTP/1.1 503 Unavailable\r\n\r\n<html>retry later</html>".getBytes))
    // the composite's gate expression, applied to the same frame shape
    val kept = Warc.httpResponses(Warc.records(Seq(b).toDS()))
      .filter(col("http_status") === 200)
      .collect().map(_.getAs[String]("url"))
    assert(kept.toSeq == Seq("http://h.com/ok"),
      s"only the 200 body may reach decode: ${kept.toSeq}")
  }

  test("LAW: the byte-fed crawl front door equals the fixture-frame " +
      "front door row-for-row (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    val byteFed = graft.queries.Crawl.dsCrawlFromWarc(spark, d)
      .collect().map(_.toSeq).toSet
    val frame = graft.queries.Crawl.dsCrawl(spark, d)
      .collect().map(_.toSeq).toSet
    assert(byteFed == frame,
      s"symmetric diff: ${(byteFed diff frame) ++ (frame diff byteFed)}")
    assert(byteFed.nonEmpty)
  }
}
