package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the C4-style first stage
  * of a crawl pipeline, BEFORE any content dedup runs: normalize each
  * page's URL, drop blocklisted domains, and keep one fetch per
  * canonical URL. (Reference scope note: the candy pipeline has no
  * crawl stage; this belongs to the LLM-training-data surface the
  * library claims, like operators/Html.)
  *
  * The canonicalization CONTRACT is a closed-form regex cascade —
  * pure codegen'd projections, oracle-replayable, no UDF:
  *
  *  1. trim surrounding whitespace
  *  2. lowercase the `scheme://authority` prefix (path/query stay
  *     case-sensitive per RFC 3986)
  *  3. strip a leading `www.` from http(s) hosts
  *  4. strip the fragment (`#…`)
  *  5. strip the scheme's default port (`:80` for http, `:443` for
  *     https — a default port on the OTHER scheme is meaningful and
  *     kept)
  *  6. strip tracking parameters (`utm_*`, `gclid`, `fbclid`,
  *     `ref`), wherever they sit in the query string, dropping the
  *     `?` when nothing survives
  *  7. strip trailing `/` runs at the end of the URL or directly
  *     before the query
  *
  * Scale shape: canonicalization is a projection over the crawl
  * manifest (no shuffle); [[dedupByUrl]] then pays exactly ONE
  * shuffle keyed on the canonical URL, with map-side combine (min +
  * count partials) so shuffle volume is one row per distinct URL per
  * task — the minimal honest cost of a global keep-first. The
  * blocklist gate runs BEFORE the exchange, so blocked fetches never
  * shuffle at all.
  */
object Urls {

  /** Query parameters that never identify content. */
  val trackingParamsRe = "utm_[a-z0-9_]*|gclid|fbclid|ref"

  def canonicalize(url: Column): Column = {
    val t = trim(url)
    // lowercase scheme://authority, leave path/query/fragment as-is
    val prefix = regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val c1 = concat(lower(prefix),
      t.substr(length(prefix) + 1, length(t)))
    val c2 = regexp_replace(c1, "^(https?://)www\\.", "$1")
    val c3 = regexp_replace(c2, "#.*$", "")
    val c4 = regexp_replace(c3, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    val c5 = regexp_replace(c4, "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    // tracking params: non-first (&t=v), first-with-successor (?t=v&),
    // then sole (?t=v$) — after pass one at most one leading remains
    val c6 = regexp_replace(c5, s"&(?:$trackingParamsRe)=[^&#]*", "")
    val c7 = regexp_replace(c6, s"\\?(?:$trackingParamsRe)=[^&#]*&", "?")
    val c8 = regexp_replace(c7, s"\\?(?:$trackingParamsRe)=[^&#]*$$", "")
    regexp_replace(c8, "([^/:])/+(\\?.*)?$", "$1$2")
  }

  /** Host of an already-canonical URL ('' when there is none). */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1)

  /** Blocklist predicate over a host column/expression: exact match
    * or dot-suffix (`example.com` blocks `a.example.com`). */
  def hostBlocked(host: Column, blockedDomains: Seq[String]): Column =
    blockedDomains.foldLeft(lit(false)) { (acc, d) =>
      acc || host === d || host.endsWith(s".$d")
    }

  /** Exact-URL keep-first + domain blocklist: one row per surviving
    * canonical URL with the smallest id (the crawl's first fetch) and
    * the fetch count. Blocklist gate BEFORE the one exchange.
    *
    * Plan-shape note (measured, r13): the filter references the
    * PROJECTED canon/host aliases, so Catalyst's CollapseProject
    * inlines the full cascade into the filter — the plan TEXT shows
    * the cascade ~5×. That duplication is free at runtime: all the
    * copies are identical UNCONDITIONAL subtrees inside one
    * whole-stage-codegen stage, and subexpression elimination
    * evaluates the cascade once. The "obvious" cheap-gate rewrite —
    * a raw-url host derivation topped by a `when(scheme-is-http,
    * strip-www)` conditional — measured 2.5× SLOWER at 100×
    * (21.7 s vs 8.5 s A/B in one JVM): CaseWhen-topped trees are
    * excluded from codegen subexpression elimination, so the 4
    * blocklist references each re-ran the host regexes. Alias
    * duplication in plan text is fine for unconditional trees;
    * a conditional at the TOP of a multiply-referenced expression
    * is what actually defeats CSE. */
  def dedupByUrl(df: DataFrame, url: Column, id: Column,
                 blockedDomains: Seq[String]): DataFrame =
    df.select(id.as("doc_id"), canonicalize(url).as("canon_url"))
      .withColumn("host", hostOf(col("canon_url")))
      .filter(!hostBlocked(col("host"), blockedDomains))
      .groupBy("canon_url")
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_fetches"))

  /** Deterministic URL fixture derived from (doc_id, source) — both
    * engines compute it identically, so canonicalization and dedup
    * are oracle-checkable on the `documents` table. Every rule above
    * is exercised data-dependently: mixed-case schemes/hosts, www
    * prefixes, default and non-default ports on both schemes,
    * trailing slashes, tracking-only / mixed / clean query strings,
    * fragments. All variation moduli divide 300, so doc d and d+300
    * canonicalize identically — the planted URL-dup structure
    * dd_url_dedup must recover. */
  def syntheticUrl(docId: Column, source: Column): Column = {
    val m = (k: Int) => pmod(docId, lit(k.toLong))
    val ms = (k: Int) => m(k).cast("string")
    val scheme = when(m(4) === 0, "HTTP").when(m(4) === 1, "https")
      .when(m(4) === 2, "Http").otherwise(lit("HTTPS"))
    val www = when(m(2) === 0, "www.").otherwise(lit(""))
    val host = when(m(4) < 2, upper(source)).otherwise(source)
    val port = when(m(5) === 0, ":80").when(m(5) === 1, ":443")
      .when(m(5) === 2, ":8080").otherwise(lit(""))
    val slash = when(m(2) === 0, "/").otherwise(lit(""))
    val query = when(m(3) === 0, lit("?utm_source=feed"))
      .when(m(3) === 1, concat(lit("?id="), ms(5)))
      .otherwise(concat(lit("?utm_campaign=x&id="), ms(5)))
    val frag = when(m(2) === 1, concat(lit("#sec"), ms(3))).otherwise(lit(""))
    concat(scheme, lit("://"), www, host, lit(".example.com"), port,
      lit("/articles/"), ms(150), slash, query, frag)
  }
}
