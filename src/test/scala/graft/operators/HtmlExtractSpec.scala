package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The HTML main-text extraction contract: the single-pass kernel is
  * bit-equal to the staged regex-cascade reference on well-formed
  * pages AND on adversarial markup soup; planted boilerplate
  * (nav/footer/script/style/comment) is dropped while prose blocks
  * survive; the kernel path plans as a shuffle-free projection. */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  private def parity(docs: org.apache.spark.sql.DataFrame): Unit = {
    val kernel = rows(Html.extractMainText(docs, col("html"), col("doc_id")))
    val staged = rows(Html.extractMainTextStaged(docs, col("html"), col("doc_id")))
    assert(kernel.keySet == staged.keySet)
    kernel.foreach { case (id, k) =>
      assert(k == staged(id), s"doc $id: kernel=$k staged=${staged(id)}")
    }
  }

  test("kernel == staged cascade on hand-built pages (every stage exercised)") {
    val docs = Seq(
      // the full furniture shape the registered query synthesizes
      (0L, "<html><head><script>var x=1;</script><style>.a{}</style></head>" +
        "<body><!-- c --><nav><a href=\"/\">home</a> <a href=\"/b\">b</a></nav>" +
        "<p>one two three four five six</p>" +
        "<p>a <a href=\"#\">link</a> heavy <a href=\"#\">pair</a></p>" +
        "<footer><a href=\"/l\">legal</a> fine</footer></body></html>"),
      // entities in text and inside tags; &amp;lt; must decode to &lt;
      (1L, "<p>x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt; ok z</p>"),
      // unterminated script: opening tag stripped as generic, body kept
      (2L, "<p>alpha beta <script gamma delta epsilon zeta eta theta</p>"),
      // unterminated comment: the <!-- falls through; '>' text is literal
      (3L, "<p>aa <!-- bb cc dd ee ff gg</p><p>h &gt; i j k l m</p>"),
      // tag spanning markup: <foo <a > consumed to the first '>'
      (4L, "<p>uu <foo <a > vv ww xx yy zz</p>"),
      // physical newlines delimit blocks; tabs collapse
      (5L, "line one has five tokens\nshort line\nthird\tblock\twith\tfive\ttokens"),
      // empty and null inputs
      (6L, ""), (7L, null.asInstanceOf[String]),
      // block with links exactly at the density boundary: 1 link, 5 tokens
      (8L, "<p>a b c d <a href=\"#\">e</a></p>"),
      // nested block tags back to back and a bare '<' in text
      (9L, "<p></p><p>only</p><body>q w e r t y < u</body>"),
      // attributed block tags delimit; prefix-collisions don't
      (10L, "<div class=\"c\">one two three four five six</div>" +
        "<pre>not a block v w x y z</pre>" +
        "<divx>alpha beta gamma delta epsilon</divx>"),
      // self-closing br splits a block; header vs head vs h1 resolve
      (11L, "<header>hh</header><p>a b c d e<br/>f g h i j</p>" +
        "<h1>one two three four five</h1>"),
      // a truly unterminated attributed div (no '>' anywhere after)
      // is NOT a block boundary: its text stays literal. NB with any
      // later '>' the regex's [^>]* runs to it — the div would then
      // terminate there and delimit, swallowing the middle
      (12L, "<p>x1 x2 x3 x4 x5</p><div class=unclosed n o p q r"),
      // a terminated S1 construct at the tag-name boundary IS the
      // ' ' boundary (S1 runs before S2 in the staged cascade):
      // <div<!--x-->> segments — two blocks, not one generic tag
      (13L, "a b c d e<div<!--x-->>f g h i j k"),
      // numeric character references: decimal/hex/nbsp decode (NBSP
      // glues tokens), non-BMP emits a surrogate pair, the invalid
      // classes (surrogate, out-of-range, 8-digit run, zero) stay
      // literal, and a decoded &#10; is a space — never a block break
      (14L, "<p>pre s&#160;t &#x2014; u&nbsp;v &#x1F600; &#xD800; " +
        "&#1114112; &#99999999; &#x0; w&#10;x post</p>"),
      // single-pass law: a decoded '&' is never re-parsed
      (15L, "<p>q1 q2 q3 q4 &#38;#x41; z</p>"),
      // an S1 construct right after '<a' is the staged ' ' — the
      // link-density gate must count it on both paths
      (16L, "<p>k1 <a<!--c-->href=\"#\">k2</a> k3</p>"))
      .toDF("doc_id", "html")
    parity(docs)
    val k = rows(Html.extractMainText(docs, col("html"), col("doc_id")))
    // doc 0: nav (2 links / 2 tokens) and footer (1/2) dropped, the
    // link-heavy paragraph (2 links / 4 tokens) dropped, prose kept
    assert(k(0L)._1 == "one two three four five six")
    assert(k(0L) == (("one two three four five six", 4L, 1L, 5L)))
    // doc 1: the five entities decode, &amp;lt; -> literal &lt;
    assert(k(1L)._1 == "x & y <tag> \"q\" 's' &lt; ok z")
    // doc 2: '<script gamma ... ' has no '>' so every char is literal
    assert(k(2L)._1 == "alpha beta <script gamma delta epsilon zeta eta theta")
    // doc 3: unterminated comment is literal text; '>' entity decodes
    assert(k(3L)._1 == "aa <!-- bb cc dd ee ff gg\nh > i j k l m")
    // doc 4: '<foo <a >' is one consumed tag that counts a link
    assert(k(4L) == (("uu vv ww xx yy zz", 1L, 1L, 1L)))
    // doc 8: 1 link * 5 <= 5 tokens -> exactly on the keep boundary
    assert(k(8L) == (("a b c d e", 1L, 1L, 1L)))
    assert(k(6L) == (("", 0L, 0L, 0L)))
    assert(!k.contains(7L), "null html yields no row on either path")
    // doc 10: attributed div delimits; <pre> is inline (its text joins
    // the following <divx> text in one block — both tags strip generic)
    assert(k(10L)._1 == "one two three four five six\n" +
      "not a block v w x y z alpha beta gamma delta epsilon")
    // doc 11: <br/> splits the paragraph into two five-token blocks
    assert(k(11L)._1 == "a b c d e\nf g h i j\none two three four five")
    // doc 12: the unterminated attributed div stays literal text
    // (7 tokens, so its block passes the keep rule)
    assert(k(12L)._1 == "x1 x2 x3 x4 x5\n<div class=unclosed n o p q r")
    // doc 13: the advisor repro — S1-at-boundary segments on both paths
    assert(k(13L) == (("a b c d e\nf g h i j k", 2L, 2L, 0L)))
    // doc 14: every numeric-entity branch; tokens glue across NBSP
    assert(k(14L)._1 == "pre s\u00A0t \u2014 u\u00A0v \uD83D\uDE00 " +
      "&#xD800; &#1114112; &#99999999; &#x0; w x post")
    // doc 15: &#38; -> '&', and the following '#x41;' stays literal
    assert(k(15L)._1 == "q1 q2 q3 q4 &#x41; z")
    // doc 16: 1 link counted through the S1 boundary; 3 tokens with a
    // link fail the density gate (1*5 > 3) -> block counted, not kept
    assert(k(16L) == (("", 1L, 0L, 1L)))
  }

  test("kernel == staged cascade on adversarial markup soup (fuzz)") {
    val rng = new scala.util.Random(42)
    val pieces = Vector(
      "<p>", "</p>", "<nav>", "</nav>", "<footer>", "</footer>",
      "<body>", "</body>", "<script>", "</script>", "<script src=\"x\">",
      "<style>", "</style>", "<!--", "-->", "<a href=\"#\">", "<a>", "</a>",
      "<div>", "<div class=\"c\">", "<", ">", "&amp;", "&lt;", "&gt;",
      "&quot;", "&#39;", "&bad;", "&", "word", "tok", "x", "\n", "\t", " ",
      "  ", "é", "日本",
      // INCOMPLETE tag fragments — real crawled markup soup: composed
      // with the terminated pieces above they put S1 constructs at
      // tag-name boundaries, inside attribute scans, and after '<a'
      "<div", "<p", "<script", "<a", "<!--x-->", "<th", "<thead>",
      // numeric/named entity fragments, valid and broken
      "&#160;", "&#x2014;", "&nbsp;", "&#x1F600;", "&#xD800;", "&#10;",
      "&#1114112;", "&#99999999;", "&#x0;", "&#", ";", "&#38;", "&#xG;")
    val docs = (0L until 300L).map { i =>
      (i, (0 until rng.nextInt(40))
        .map(_ => pieces(rng.nextInt(pieces.size)))
        .mkString(if (rng.nextBoolean()) " " else ""))
    }.toDF("doc_id", "html")
    parity(docs)
  }

  test("kernel == staged on the registered query's synthesized corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        Html.syntheticPage(col("text"), col("source")).as("html"))
    parity(docs)
  }

  test("carry columns colliding with the output schema fail loudly") {
    val docs = Seq((0L, "<p>a b c d e</p>", "x")).toDF("doc_id", "html", "main_text")
    val e = intercept[IllegalArgumentException] {
      Html.extractMainText(docs, col("html"), col("doc_id"),
        carry = Seq(col("main_text")))
    }
    assert(e.getMessage.contains("main_text"))
    intercept[IllegalArgumentException] {
      Html.extractMainText(docs, col("html"), col("doc_id"),
        carry = Seq(col("html"), col("html")))
    }
    // an aliased carry passes and rides through unchanged
    val ok = Html.extractMainText(docs, col("html"), col("doc_id"),
      carry = Seq(col("main_text").as("carried")))
    assert(ok.columns.contains("carried") && ok.select("carried")
      .collect().head.getString(0) == "x")
  }

  test("extraction is a shuffle-free projection (the staged path is not)") {
    val dir = java.nio.file.Files.createTempDirectory("html_plan").toString
    Seq((0L, "<p>a b c d e</p>"), (1L, "<nav><a href=\"/\">x</a></nav>"))
      .toDF("doc_id", "html").write.mode("overwrite").parquet(dir)
    val pages = spark.read.parquet(dir)
    val plan = Html.extractMainText(pages, col("html"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_html_extract"), plan)
    assert(!plan.contains("Exchange"), s"kernel extraction shuffles:\n$plan")
    assert(!plan.contains("Generate"), s"kernel extraction explodes:\n$plan")
    val stagedPlan = Html.extractMainTextStaged(pages, col("html"), col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(stagedPlan.contains("Exchange"),
      "staged reference should show the reassembly shuffle the kernel removes")
  }
}
