package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.tokenHash

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * pure column expressions (whole-stage codegen, no UDFs) — they
  * scale as a single projection over the corpus, no shuffle at all
  * until an explicit aggregation.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex token pieces: letter runs, digit runs, or single
    * non-alphanumeric symbols. */
  val bpeTokenRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def tokenCounts(df: DataFrame, text: Column, idCols: Column*): DataFrame =
    df.select(idCols :+
      size(tokens(text)).as("ws_tokens") :+
      size(regexp_extract_all(text, lit(bpeTokenRegex), lit(0))).as("bpe_tokens"): _*)

  /** Tiny per-language stopword profiles (n-gram-free heuristic: a
    * language "wins" on stopword hits; `und` = undetermined). The
    * profiles are deliberately minimal — the operator shape (N
    * profile scores + argmax, one projection) is what scales. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ein", "ist", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "que", "un", "est", "pas"))

  private def hits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Language-ID: per-profile hit counts + deterministic argmax
    * (ties break by profile order; all-zero → "und"). */
  def languageId(text: Column): Column = {
    val scored = langProfiles.map { case (lang, ws) => (lang, hits(text, ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality signals: token count, mean token length, stopword ratio,
    * alphabetic-token ratio, punctuation density. */
  def qualityScore(df: DataFrame, text: Column, idCols: Column*): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    val sw = langProfiles.flatMap(_._2).distinct
    df.select(idCols :+
      nTok.as("n_tokens") :+
      (aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x).cast("double")
        / nTok).as("avg_token_len") :+
      (size(filter(toks, t => t.isInCollection(sw))).cast("double") / nTok)
        .as("stopword_ratio") :+
      (size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("double") / nTok)
        .as("alpha_ratio") :+
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .as("punct_chars"): _*)
  }

  /** Order-insensitive content fingerprint: md5 over the sorted
    * distinct token set — the canonical "same bag of words" key. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))).cast("binary"))

  /** Cleaning pass: lowercase, strip non-alphanumerics (keep spaces),
    * collapse whitespace runs, trim — the canonical normalization
    * before tokenization/dedup. Pure codegen'd projection. */
  def cleaned(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Deterministic train/val/test assignment from a portable content
    * hash of the id — stable across engines, runs, and cluster sizes
    * (never use RNG for split assignment: reshuffling changes the
    * split). 80/10/10. */
  def splitAssign(id: Column): Column = {
    val bucket = pmod(tokenHash(id.cast("string")), lit(100L))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise(lit("test"))
  }

  val hashVecDims = 16

  /** Hashing-trick term-frequency vectorization: token → hash → one
    * of `hashVecDims` buckets; per-document counts per bucket. The
    * classic pre-embedding featurizer (feature hashing / HashingTF),
    * as one explode + one grouped aggregation with conditional
    * counts — no vocabulary build, no second pass, trivially
    * parallel at corpus scale. Emitted as separate columns c0..c15
    * (engine-portable; assemble into an array/vector as needed). */
  def hashedTermFrequency(df: DataFrame, text: Column, id: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .withColumn("bucket", pmod(tokenHash(col("token")), lit(hashVecDims.toLong)))
    val counts = (0 until hashVecDims).map { j =>
      sum(when(col("bucket") === j, 1L).otherwise(0L)).as(s"c$j")
    }
    tok.groupBy("doc_id").agg(counts.head, counts.tail: _*)
  }

  /** PII-masking regexes — kept RE2-compatible (no backrefs or
    * lookaround) so Java (Spark) and RE2-based engines match the
    * identical spans. */
  val emailRegex = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phoneRegex = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** PII redaction: mask emails then phone-shaped digit groups. A
    * pure regexp projection (codegen'd, no shuffle) — the standard
    * pre-release scrub over a training corpus. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailRegex, "[EMAIL]"),
      phoneRegex, "[PHONE]")

  val fpPrime = 2147483647L // 2^31 − 1

  /** Order-SENSITIVE positional fingerprint: Σ position-weighted
    * token hashes mod p — a rolling-hash-family key that detects
    * reordered documents, yet is a single scan (and expressible as
    * plain SQL, unlike an iterated polynomial fold). */
  def positionalFingerprint(text: Column): Column =
    aggregate(
      zip_with(tokens(text), sequence(lit(1), size(tokens(text))),
        (t, i) => pmod(tokenHash(t) * i.cast("long"), lit(fpPrime))),
      lit(0L), (acc, v) => pmod(acc + v, lit(fpPrime)))
}
