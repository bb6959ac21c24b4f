package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization's two non-regex steps as compiled byte walks:
  * percent-escape normalization (`graft_url_pct`, cascade step 2) and
  * query-parameter sorting (`graft_url_qsort`, step 9).
  *
  * Why kernels and not `split`/`transform`/`array_sort`: higher-order
  * functions are interpreted (CodegenFallback), and the canonicalize
  * cascade is INLINED several times in the URL-dedup plan (the filter
  * and group key reference the projected alias — the CollapseProject
  * shape Urls.dedupByUrl documents). With codegen'd regex stages the
  * copies are collapsed by whole-stage-codegen subexpression
  * elimination; the r14 relational forms of these two steps broke
  * that — the quiet sf0.1 sweep measured dd_url_dedup 2.4 → 8.8 s and
  * ds_crawl 6.0 → 10.4 s. As plain unary codegen'd calls the cascade
  * is CSE-eligible end to end again (the same HOF→kernel lesson as
  * the minhash/hash-embed kernels).
  *
  * Byte-level semantics (exactly the relational reference retained in
  * Urls.percentNormalizeStaged / sortQueryParamsStaged, and the
  * DuckDB oracle mirror):
  *  - pct: after each '%', two hex bytes decode to their codepoint
  *    when RFC 3986 UNRESERVED (ALPHA / DIGIT / `-._~`), uppercase
  *    otherwise; '%' not followed by two hex bytes stays literal.
  *  - qsort: split at the FIRST '?'; an empty query drops the '?';
  *    otherwise '&'-separated params sort by UNSIGNED byte order —
  *    identical to Spark's `array_sort` on UTF8String and DuckDB's
  *    `list_sort` (both binary orders), where a UTF-16 `String`
  *    comparison would diverge on supplementary-plane text. All
  *    structural bytes ('%', hex, '?', '&') are ASCII and never occur
  *    inside a UTF-8 continuation, so the byte walk is
  *    encoding-safe. */
abstract class UrlByteKernel extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }
}

case class UrlPercentNorm(child: Expression) extends UrlByteKernel {
  override protected def nullSafeEval(in: Any): Any =
    UrlNorm.percentNorm(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UrlNorm.percentNorm($c);")
  override def prettyName: String = "graft_url_pct"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UrlQuerySort(child: Expression) extends UrlByteKernel {
  override protected def nullSafeEval(in: Any): Any =
    UrlNorm.querySort(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UrlNorm.querySort($c);")
  override def prettyName: String = "graft_url_qsort"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cascade step 8.5 (`graft_url_dotfold`): RFC 3986
  * remove_dot_segments over the URL's PATH portion — `/./` collapses,
  * `/seg/../` pops, `..` above the root is a no-op, and a trailing
  * `/.`|`/..` keeps the directory slash (so `/a/b/..` → `/a/`,
  * composing with the cascade's trailing-slash strip to `/a`). A
  * segment-stack walk has no closed regex form (the fold is a
  * fixpoint), and as a higher-order `aggregate` it would be
  * interpreted — the same CodegenFallback/CSE break the pct/qsort
  * kernels exist to avoid. Query and fragment are untouched; inputs
  * without a `scheme://authority/` prefix return unchanged. The
  * relational reference (the living spec UrlsSpec fuzzes this
  * against) is Urls.foldDotSegmentsStaged. */
case class UrlDotFold(child: Expression) extends UrlByteKernel {
  override protected def nullSafeEval(in: Any): Any =
    UrlNorm.dotFold(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.UrlNorm.dotFold($c);")
  override def prettyName: String = "graft_url_dotfold"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlNorm {

  private def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')
  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0' else (b | 0x20) - 'a' + 10
  private def upHex(b: Byte): Byte =
    if (b >= 'a' && b <= 'f') (b - 32).toByte else b
  private def unreserved(cp: Int): Boolean =
    (cp >= '0' && cp <= '9') || (cp >= 'A' && cp <= 'Z') ||
      (cp >= 'a' && cp <= 'z') || cp == '-' || cp == '.' ||
      cp == '_' || cp == '~'

  def percentNorm(in: UTF8String): UTF8String = {
    val b = in.getBytes
    val out = new Array[Byte](b.length) // decode shrinks, re-case keeps
    var i = 0
    var o = 0
    while (i < b.length) {
      if (b(i) == '%' && i + 2 < b.length && isHex(b(i + 1)) && isHex(b(i + 2))) {
        val cp = hexVal(b(i + 1)) * 16 + hexVal(b(i + 2))
        if (unreserved(cp)) { out(o) = cp.toByte; o += 1 }
        else {
          out(o) = '%'; out(o + 1) = upHex(b(i + 1)); out(o + 2) = upHex(b(i + 2))
          o += 3
        }
        i += 3
      } else { out(o) = b(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** remove_dot_segments over the path of a hierarchical URL: the
    * path is [first '/' after `://`'s authority, first '?' or '#');
    * its '/'-separated segments run through a stack — `.` skipped,
    * `..` pops, anything else (empty segments included: `//` is
    * preserved) pushed — and a final `.`|`..` segment re-appends the
    * directory slash (RFC 3986 §5.2.4's replace-vs-remove split).
    * Fast path: a path without the byte pair "/." returns the input
    * array untouched. */
  def dotFold(in: UTF8String): UTF8String = {
    val b = in.getBytes
    // locate "://", then the authority's end — the path start
    var i = 0
    while (i + 2 < b.length &&
      !(b(i) == ':' && b(i + 1) == '/' && b(i + 2) == '/')) i += 1
    if (i + 2 >= b.length) return in
    var p = i + 3
    while (p < b.length && b(p) != '/' && b(p) != '?' && b(p) != '#') p += 1
    if (p >= b.length || b(p) != '/') return in
    var q = p
    while (q < b.length && b(q) != '?' && b(q) != '#') q += 1
    // fast path: no "/." anywhere in [p, q)
    var k = p
    var hasDot = false
    while (k + 1 < q && !hasDot) {
      if (b(k) == '/' && b(k + 1) == '.') hasDot = true
      k += 1
    }
    if (!hasDot) return in
    // stack of (start, end) segment spans over b, path = [p, q)
    val starts = new Array[Int](q - p)
    val ends = new Array[Int](q - p)
    var top = 0
    var s = p + 1
    var lastWasDots = false
    var j = p + 1
    while (j <= q) {
      if (j == q || b(j) == '/') {
        val len = j - s
        val isDot = len == 1 && b(s) == '.'
        val isDotDot = len == 2 && b(s) == '.' && b(s + 1) == '.'
        if (isDot) ()                      // skip
        else if (isDotDot) { if (top > 0) top -= 1 }
        else { starts(top) = s; ends(top) = j; top += 1 }
        lastWasDots = (isDot || isDotDot) && j == q
        s = j + 1
      }
      j += 1
    }
    val out = new Array[Byte](b.length)
    System.arraycopy(b, 0, out, 0, p)
    var o = p
    var t = 0
    while (t < top) {
      out(o) = '/'; o += 1
      val len = ends(t) - starts(t)
      System.arraycopy(b, starts(t), out, o, len)
      o += len
      t += 1
    }
    if (top == 0 || lastWasDots) { out(o) = '/'; o += 1 }
    System.arraycopy(b, q, out, o, b.length - q)
    o += b.length - q
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def querySort(in: UTF8String): UTF8String = {
    val b = in.getBytes
    var q = 0
    while (q < b.length && b(q) != '?') q += 1
    if (q >= b.length) return in                       // no query
    if (q == b.length - 1)                             // '…?' → no '?'
      return UTF8String.fromBytes(java.util.Arrays.copyOf(b, q))
    // split (q, end] on '&', keeping empty params — mirrors
    // split(query, "&", -1) / string_split
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var s = q + 1
    var i = q + 1
    while (i <= b.length) {
      if (i == b.length || b(i) == '&') {
        parts += java.util.Arrays.copyOfRange(b, s, i)
        s = i + 1
      }
      i += 1
    }
    val arr = parts.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[Array[Byte]] {
      def compare(x: Array[Byte], y: Array[Byte]): Int = {
        val n = math.min(x.length, y.length)
        var k = 0
        while (k < n) {
          val d = (x(k) & 0xFF) - (y(k) & 0xFF)
          if (d != 0) return d
          k += 1
        }
        x.length - y.length
      }
    })
    val out = new Array[Byte](b.length)
    System.arraycopy(b, 0, out, 0, q + 1)
    var o = q + 1
    var p = 0
    while (p < arr.length) {
      if (p > 0) { out(o) = '&'; o += 1 }
      System.arraycopy(arr(p), 0, out, o, arr(p).length)
      o += arr(p).length
      p += 1
    }
    UTF8String.fromBytes(out)
  }
}
