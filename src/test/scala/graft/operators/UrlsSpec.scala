package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization cascade + keep-first dedup: adversarial URL
  * fixtures pin every rule and its edge, and the dedup recovers the
  * planted collision structure with the blocklist applied pre-group. */
class UrlsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: Seq[String]): Map[String, String] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    df.select(col("url"), Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("canonicalization rules, one adversarial fixture per edge") {
    val cases = Seq(
      // scheme+host lowering, path case preserved
      "HTTP://WWW.Example.COM/Path/File" -> "http://example.com/Path/File",
      // default ports stripped only on the matching scheme
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:443/x" -> "http://a.com:443/x",
      "https://a.com:80/x" -> "https://a.com:80/x",
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // default port with empty path / query / fragment after it
      "http://a.com:80" -> "http://a.com",
      "http://a.com:80?q=1" -> "http://a.com?q=1",
      "http://a.com:80#f" -> "http://a.com",
      // fragment stripped, even when it contains separators
      "http://a.com/x#frag?fake=1&z=2" -> "http://a.com/x",
      // tracking params: sole, leading, trailing, middle, repeated
      "http://a.com/x?utm_source=f" -> "http://a.com/x",
      "http://a.com/x?utm_source=f&id=2" -> "http://a.com/x?id=2",
      "http://a.com/x?id=2&utm_source=f" -> "http://a.com/x?id=2",
      "http://a.com/x?a=1&gclid=g&b=2" -> "http://a.com/x?a=1&b=2",
      "http://a.com/x?utm_a=1&utm_b=2" -> "http://a.com/x",
      "http://a.com/x?ref=r&ref=s&b=2" -> "http://a.com/x?b=2",
      "http://a.com/x?fbclid=z" -> "http://a.com/x",
      // 'ref' only matches the whole param name, not a prefix
      "http://a.com/x?referrer=keep" -> "http://a.com/x?referrer=keep",
      // trailing slash: path, before-query, runs; the root slash also
      // unifies (http://a.com/ and http://a.com are RFC-equivalent)
      "http://a.com/x/" -> "http://a.com/x",
      "http://a.com/x///" -> "http://a.com/x",
      "http://a.com/x/?id=1" -> "http://a.com/x?id=1",
      "http://a.com/" -> "http://a.com",
      // www only strips on http(s), and only as a prefix label
      "ftp://www.a.com/x" -> "ftp://www.a.com/x",
      "http://wwwx.a.com/x" -> "http://wwwx.a.com/x",
      // whitespace trim; schemeless input passes through case-intact
      "  http://a.com/x " -> "http://a.com/x",
      "not a url" -> "not a url",
      // query parameters sort byte-lexicographically; values keep
      // their internal order ('&'-pieces sort as whole strings)
      "http://a.com/x?b=2&a=1" -> "http://a.com/x?a=1&b=2",
      "http://a.com/x?b=2&utm_source=f&a=1" -> "http://a.com/x?a=1&b=2",
      "http://a.com/x?a=2&a=1" -> "http://a.com/x?a=1&a=2",
      // an empty query is no query
      "http://a.com/x?" -> "http://a.com/x",
      // percent-escapes: unreserved decode (either hex case), other
      // escapes uppercase their hex, '%' + non-hex stays literal
      "http://a.com/%7Efoo" -> "http://a.com/~foo",
      "http://a.com/%7efoo" -> "http://a.com/~foo",
      "http://a.com/a%3fb" -> "http://a.com/a%3Fb",
      "http://a.com/%zz%4" -> "http://a.com/%zz%4",
      // decode runs BEFORE case-folding: a hidden host letter decodes
      // and then lowercases (idempotence demands this order)
      "http://EX%41MPLE.com/x" -> "http://example.com/x")
    val got = canon(cases.map(_._1))
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"canon('$in') = '${got(in)}', want '$want'")
    }
  }

  test("canonicalization is idempotent (canon∘canon == canon)") {
    // the defining law of a canonical form: a second pass must be a
    // no-op, on every adversarial fixture AND the registered corpus
    // fixture — a rule that re-fires on its own output (e.g. a port
    // strip exposing a new match) would silently split dedup groups
    // between single- and double-canonicalized producers
    val adversarial = Seq(
      "HTTP://WWW.Example.COM:80/Path/?utm_source=f&id=2#frag",
      "https://a.com:443/x///", "http://a.com:8080/?ref=r",
      "  ftp://www.a.com/x ", "not a url", "http://a.com/x?utm_a=1&utm_b=2",
      // the new rules' re-fire candidates: a decoded letter must not
      // re-case, a sorted query must not re-sort, a kept escape must
      // not re-decode, a dropped bare '?' must stay dropped
      "http://EX%41MPLE.com:80/%7e/?b=1&a=2#f", "http://a.com/%7E?",
      "http://a.com/x?b=2&a=1&utm_b=3", "http://a.com/a%3fb%25?z=1&y=2")
    import spark.implicits._
    val df = adversarial.toDF("url")
      .unionByName(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(Urls.syntheticUrl(col("doc_id"), col("source")).as("url")))
    val got = df.select(
        Urls.canonicalize(col("url")).as("once"),
        Urls.canonicalize(Urls.canonicalize(col("url"))).as("twice"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"canon not idempotent: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("pct/qsort kernels == relational references (adversarial fuzz)") {
    import spark.implicits._
    // piece pool biased toward the kernels' edges: escapes in every
    // case/validity class, bare and doubled '%', multi-byte text,
    // empty params, repeated '?', '&' runs
    val pieces = Vector("%7E", "%7e", "%3f", "%3F", "%41", "%zz", "%4", "%",
      "%%41", "?", "&", "a=1", "b=2", "A=3", "=", "", "x", "é", "日本", "~",
      "%C3%A9", "%e9", "?b=2&a=1", "#f", "/p")
    val rng = new scala.util.Random(7)
    val urls = (0 until 400).map(_ =>
      "http://h.com/" + (0 until rng.nextInt(8))
        .map(_ => pieces(rng.nextInt(pieces.size))).mkString) :+
      "" :+ "?" :+ "%" :+ "a?b?c&d"
    val df = urls.toDF("u")
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val rows = df.select(col("u"),
        call_function("graft_url_pct", col("u")).as("kp"),
        Urls.percentNormalizeStaged(col("u")).as("sp"),
        call_function("graft_url_qsort", col("u")).as("kq"),
        Urls.sortQueryParamsStaged(col("u")).as("sq"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"pct mismatch on '${r.getString(0)}': " +
          s"kernel='${r.getString(1)}' staged='${r.getString(2)}'")
      assert(r.getString(3) == r.getString(4),
        s"qsort mismatch on '${r.getString(0)}': " +
          s"kernel='${r.getString(3)}' staged='${r.getString(4)}'")
    }
  }

  test("keep-first URL dedup recovers planted collisions; blocklist gates pre-group") {
    val df = Seq(
      (10L, "HTTP://www.A.com:80/p/?utm_source=x"), // canon: http://a.com/p
      (3L, "http://a.com/p"),                       // same page, first fetch
      (7L, "https://a.com/p"),                      // different scheme: distinct
      (5L, "http://ads.bad.com/z"),                 // blocked by suffix
      (6L, "http://bad.com/z"),                     // blocked exactly
      (8L, "http://notbad.com/z"))                  // NOT blocked (no dot-suffix match)
      .toDF("doc_id", "url")
    val out = Urls.dedupByUrl(df, col("url"), col("doc_id"), Seq("bad.com"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "http://a.com/p" -> ((3L, 2L)),
      "https://a.com/p" -> ((7L, 1L)),
      "http://notbad.com/z" -> ((8L, 1L))))
  }

  test("the registered fixture plants exact d/d+300 canon collisions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val c = docs.select(col("doc_id"),
        Urls.canonicalize(
          Urls.syntheticUrl(col("doc_id"), col("source"))).as("canon"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = c.size
    c.keys.filter(d => c.contains(d + 300)).foreach { d =>
      assert(c(d) == c(d + 300), s"doc $d and ${d + 300} must collide")
    }
    // and nothing else collides: distinct canon count = docs - planted pairs
    val planted = c.keys.count(d => c.contains(d + 300))
    assert(c.values.toSet.size == n - planted)
  }

  test("canonicalization + gate stay a pushdown-friendly single scan") {
    val dir = java.nio.file.Files.createTempDirectory("url_plan").toString
    Seq((1L, "http://a.com/x/"), (2L, "https://b.com/y?utm_source=f"))
      .toDF("doc_id", "url").write.mode("overwrite").parquet(dir)
    val plan = Urls.dedupByUrl(spark.read.parquet(dir), col("url"),
        col("doc_id"), Seq("bad.com"))
      .queryExecution.executedPlan.toString
    // exactly one exchange: the keep-first groupBy on the canonical
    // URL (with map-side partial min/count); the blocklist filter and
    // the whole cascade run before it
    assert(plan.split("Exchange").length - 1 == 1,
      s"URL dedup should shuffle exactly once:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"keep-first must combine map-side:\n$plan")
    // NOTE the plan TEXT shows the cascade inlined several times
    // (CollapseProject substitutes the canon/host aliases into the
    // filter); that is fine — the copies are identical unconditional
    // subtrees in one codegen stage and subexpression elimination
    // evaluates the cascade once. See Urls.dedupByUrl's plan-shape
    // note for the measured A/B against the "cheap gate" rewrite.
  }
}
