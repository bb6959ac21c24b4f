package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Charset detection / transcoding at the fetch boundary — the front
  * door BEFORE the front door: everything downstream of the crawl
  * admission (extraction kernel, hashes, dedup keys) assumes the
  * payload is already a valid UTF-8 string, but real crawls are
  * 10–20% non-UTF-8 and a mojibake'd decode silently corrupts every
  * derived key. Same batched partition-local byte-walk shape as
  * [[Multimodal]] (the r19 verdict's prescription): zero shuffle, a
  * real pure-JVM decision over the actual bytes.
  *
  * Decision cascade, most-authoritative first (WHATWG encoding
  * sniffing, folded to the closed-form core):
  *
  *  1. BOM: EF BB BF → utf-8, FF FE → utf-16le, FE FF → utf-16be
  *     (stripped from the decoded text — it is a marker, not content);
  *  2. in-document declaration over the first [[headBytes]] bytes
  *     read as ISO-8859-1 (an ASCII-transparent view — every
  *     declaration this step may legally bind to is ASCII): an XML
  *     `encoding=` pseudo-attribute, else an HTML `charset=` (both
  *     `<meta charset=…>` and the `http-equiv` content form match the
  *     one pattern); unknown names fall through;
  *  3. content sniff: strict UTF-8 validation of the whole payload —
  *     valid → utf-8, invalid → the ISO-8859-1 fallback (total: every
  *     byte sequence is a code point, so the door never throws).
  *
  * Output per fetch: `(doc_id, text, charset, had_bom,
  * was_transcoded)` — `was_transcoded` = the stored text differs from
  * a naive UTF-8 read of the payload (non-UTF-8 charset or a stripped
  * BOM), the audit bit a recrawl can alert on. */
object Charset {

  val batchSize = 64

  /** Declaration scan window: declarations beyond the first KiB are
    * non-conforming (WHATWG prescan stops at 1024). */
  val headBytes = 1024

  final case class RawFetch(doc_id: Long, payload: Array[Byte])
  final case class DecodedFetch(doc_id: Long, text: String,
      charset: String, had_bom: Boolean, was_transcoded: Boolean)

  /** Canonical names for the labels this door emits; aliases beyond
    * these fall through to the content sniff (a conservative door
    * mis-decodes nothing it does not positively recognize). */
  private val aliases: Map[String, String] = Map(
    "utf-8" -> "utf-8", "utf8" -> "utf-8",
    "iso-8859-1" -> "iso-8859-1", "iso8859-1" -> "iso-8859-1",
    "latin-1" -> "iso-8859-1", "latin1" -> "iso-8859-1",
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "utf-16le" -> "utf-16le", "utf-16be" -> "utf-16be",
    "us-ascii" -> "us-ascii", "ascii" -> "us-ascii")

  private val javaName: Map[String, String] = Map(
    "utf-8" -> "UTF-8", "iso-8859-1" -> "ISO-8859-1",
    "windows-1252" -> "windows-1252",
    "utf-16le" -> "UTF-16LE", "utf-16be" -> "UTF-16BE",
    "us-ascii" -> "US-ASCII")

  private val declPattern = java.util.regex.Pattern.compile(
    "(?i)(?:encoding|charset)\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)")

  private def strictDecode(p: Array[Byte], off: Int,
                           cs: String): Option[String] = {
    val dec = java.nio.charset.Charset.forName(cs).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(
      java.nio.ByteBuffer.wrap(p, off, p.length - off)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  private def decodeOne(r: RawFetch): DecodedFetch = {
    val p = r.payload
    def b(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    // 1. BOM
    val bom: Option[(String, Int)] =
      if (b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf) Some(("utf-8", 3))
      else if (b(0) == 0xff && b(1) == 0xfe) Some(("utf-16le", 2))
      else if (b(0) == 0xfe && b(1) == 0xff) Some(("utf-16be", 2))
      else None
    val (charset, off, hadBom) = bom match {
      case Some((cs, n)) => (cs, n, true)
      case None =>
        // 2. declaration over the ASCII-transparent head view
        val head = new String(p, 0, math.min(headBytes, p.length),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val m = declPattern.matcher(head)
        val declared =
          if (m.find()) aliases.get(m.group(1).toLowerCase) else None
        declared match {
          case Some(cs) => (cs, 0, false)
          // 3. content sniff: strict UTF-8, else Latin-1 (total)
          case None =>
            if (strictDecode(p, 0, "UTF-8").isDefined) ("utf-8", 0, false)
            else ("iso-8859-1", 0, false)
        }
    }
    // a DECLARED charset can still lie about the bytes (a cp1252 page
    // labelled utf-8): strict decode under the verdict, falling back
    // to Latin-1 — never replacement-char mojibake with a green label
    val (text, finalCs) = strictDecode(p, off, javaName(charset)) match {
      case Some(t) => (t, charset)
      case None => (new String(p, off, p.length - off,
        java.nio.charset.StandardCharsets.ISO_8859_1), "iso-8859-1")
    }
    DecodedFetch(r.doc_id, text, finalCs, hadBom,
      finalCs != "utf-8" || hadBom)
  }

  /** Batched decode — the typed core. */
  def decode(fetches: Dataset[RawFetch]): Dataset[DecodedFetch] = {
    import fetches.sparkSession.implicits._
    fetches.mapPartitions(_.grouped(batchSize).flatMap(_.map(decodeOne)))
  }

  /** DataFrame front door: `(id, payload binary)` in, the decoded
    * frame out — the shape [[graft.queries]]' crawl composites splice
    * ahead of extraction. */
  def decoded(df: DataFrame, payload: Column, id: Column): DataFrame = {
    import df.sparkSession.implicits._
    decode(df.select(id.cast("long").as("doc_id"),
      payload.as("payload")).as[RawFetch]).toDF()
  }

  // not `private`: Spark's generated SafeProjection must construct it
  final case class RawTagged(doc_id: Long, payload: Array[Byte],
      tag: String)

  /** [[decoded]] with one opaque string column carried THROUGH the
    * byte walk (the WARC chain's target URI): avoids the corpus-wide
    * join-back a decode-then-rejoin shape would pay. */
  def decodedTagged(df: DataFrame, payload: Column, id: Column,
                    tag: Column): DataFrame = {
    import df.sparkSession.implicits._
    df.select(id.cast("long").as("doc_id"), payload.as("payload"),
        tag.as("tag")).as[RawTagged]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        val d = decodeOne(RawFetch(r.doc_id, r.payload))
        (d.doc_id, d.text, d.charset, d.had_bom, d.was_transcoded, r.tag)
      }))
      .toDF("doc_id", "text", "charset", "had_bom", "was_transcoded", "tag")
  }

  // ---- deterministic mixed-encoding fixture --------------------------

  /** The five encoding postures a real crawl serves, as a closed-form
    * page per document (doc_id % 5): 0 plain UTF-8 (no declaration),
    * 1 UTF-16LE with BOM, 2 ISO-8859-1 declared via `<meta charset>`,
    * 3 windows-1252 declared via the `http-equiv` content form,
    * 4 ISO-8859-1 UNdeclared (the content-sniff fallback path). Every
    * page plants a non-ASCII marker (`café`, plus cp1252 curly quotes
    * on variant 3) whose decode under the WRONG charset yields a
    * different string — the oracle hash catches any mis-decision. */
  def syntheticEncodedPage(variant: Int, text: String): String = {
    val decl = variant match {
      case 2 => "<meta charset=\"ISO-8859-1\"/>"
      case 3 => "<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1252\"/>"
      case _ => ""
    }
    val marker = "caf\u00e9" + (if (variant == 3) " \u201cq\u201d" else "")
    s"<html><head>$decl</head><body><p>$marker $text</p></body></html>"
  }

  /** Encode [[syntheticEncodedPage]] per variant (BOM prepended on
    * variant 1) — the raw-bytes fixture [[decode]] must invert. */
  def documentsAsFetches(docs: DataFrame): Dataset[RawFetch] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].map { case (id, text) =>
        val v = (id % 5).toInt
        val page = syntheticEncodedPage(v, text)
        val bytes = v match {
          case 0 => page.getBytes("UTF-8")
          case 1 => Array(0xff.toByte, 0xfe.toByte) ++ page.getBytes("UTF-16LE")
          case 2 => page.getBytes("ISO-8859-1")
          case 3 => page.getBytes("windows-1252")
          case _ => page.getBytes("ISO-8859-1")
        }
        RawFetch(id, bytes)
      }
  }
}
