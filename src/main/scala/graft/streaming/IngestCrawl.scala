package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.{Html, Urls}

/** Continuous crawl ingestion: the streaming twin of the ds_crawl
  * composite — the front door a live crawler actually runs. Each
  * micro-batch of raw fetches (doc_id, url, html) is:
  *
  *  1. URL-canonicalized and domain-blocklisted (stateless codegen'd
  *     projections — Urls.canonicalize);
  *  2. keep-FIRST deduplicated on the canonical URL against three
  *     scopes, mirroring IngestDedup's discipline: (a) the SETTLED
  *     url frontier (an immutable artifact of the previous pipeline
  *     run), (b) itself (min doc_id wins within the batch), and
  *     (c) every URL this stream has already admitted — a re-fetch
  *     in a later batch can never re-admit a page;
  *  3. main-text extracted (the shuffle-free graft_html_extract
  *     kernel) and thin-content gated.
  *
  * Survivors land under `survivorDir/batch_<id>` with per-batch
  * overwrite, so foreachBatch's at-least-once retries are idempotent
  * — the admitted-URL state IS the sink, no side ledger.
  *
  * With `discoveredDir` set, each batch ALSO emits its pages'
  * outbound links (Html.linkHrefs → Urls.resolveHref → canonicalize →
  * blocklist, minus the admitted scope) under
  * `discoveredDir/batch_<id>` — the crawl loop's discovery half,
  * continuously. The next wave's input is then
  * `Frontier.readLayered(discoveredDir)` minus
  * `readLayered(survivorDir)`'s URLs, scheduled with
  * `Urls.politeWaves` — fetch → extract → discover → schedule, closed.
  * Discovery is a pure per-batch projection of the batch's own pages
  * against the same replay-safe scope as admission (its own overwrite
  * is idempotent for the same reason), additionally excluding this
  * batch's own fetches; per-URL dedup of the discovered set happens
  * at scheduling time, not per batch. One documented looseness: the
  * admitted scope is the SURVIVOR corpus, so a link to a page fetched
  * earlier but gated as thin can re-enter the frontier — candidates
  * are fetch-or-refetch work, which a production ledger of fetched
  * (not just kept) URLs would tighten.
  *
  * Cross-batch semantics note: "keep-first" here is first ARRIVAL
  * (processing order), the only meaningful order a stream has; batch
  * ds_crawl's min-doc_id tiebreak applies within one batch. Scale
  * shape: scope (c) probes the latest settled [[Frontier]] plus at
  * most `settleEvery` tail deltas — every `settleEvery` batches the
  * deltas fold into one compacted `frontier_<m>` dir, so the
  * per-batch probe cost is flat in the number of batches (the
  * base+delta posture of the persisted dedup index, applied to the
  * stream's own output; BASELINE.md#crawl_stream prices it).
  * Consumers read the full corpus via [[Frontier.readLayered]]. */
object IngestCrawl {

  def crawledIngest(fetches: DataFrame, settledUrls: Option[DataFrame],
                    survivorDir: String, blockedDomains: Seq[String],
                    minTokens: Int = graft.queries.DataOps.crawlMinTokens,
                    settleEvery: Int = 16,
                    discoveredDir: Option[String] = None)
      : StreamingQuery =
    fetches.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // projected-alias shape: the inlined cascade copies are
        // CSE-collapsed at runtime (Urls.dedupByUrl's plan-shape note)
        val firstInBatch = batch.toDF()
          .select(col("doc_id"), col("html"),
            Urls.canonicalize(col("url")).as("canon_url"))
          .withColumn("host", Urls.hostOf(col("canon_url")))
          .filter(!Urls.hostBlocked(col("host"), blockedDomains))
          .groupBy("canon_url")
          .agg(min(struct(col("doc_id"), col("html"))).as("w"))
          .select(col("canon_url"), col("w.doc_id").as("doc_id"),
            col("w.html").as("html"))
        // admitted frontier: settled run artifact + this run's EARLIER
        // batches (the current id excluded — a retry must not
        // anti-join its own partial output, see BatchLayout)
        val prevUrls = BatchLayout.earlierBatches(spark, survivorDir, batchId)
          .map(paths => spark.read.parquet(paths: _*).select("canon_url"))
        val seen = (settledUrls.map(_.select("canon_url")).toSeq ++ prevUrls.toSeq)
          .reduceOption(_ unionByName _)
        val fresh = seen match {
          case Some(sn) =>
            firstInBatch.join(sn.distinct(), Seq("canon_url"), "left_anti")
          case None => firstInBatch
        }
        val ext = Html.extractMainText(fresh, col("html"), col("doc_id"),
          carry = Seq(col("canon_url")))
        val nTok = when(col("main_text") === "", 0L)
          .otherwise(size(split(col("main_text"), "[ \\n]")).cast("long"))
        ext.select(col("doc_id"), col("canon_url"), col("main_text"),
            col("kept_blocks"), nTok.as("n_tokens"))
          .filter(col("n_tokens") >= minTokens)
          .write.mode("overwrite").parquet(s"$survivorDir/batch_$batchId")
        // discovery half (optional): this batch's outbound links as
        // next-wave candidates — raw-href gate BEFORE the resolve
        // chain (the filter-pushdown clone trap), blocklist before
        // the write, already-admitted URLs excluded via the same
        // replay-safe scope as admission
        discoveredDir.foreach { dd =>
          val links = fresh
            .select(col("canon_url").as("referrer"),
              explode(Html.linkHrefs(col("html"))).as("href"))
            .filter(!col("href").startsWith("#") && col("href") =!= "")
            .select(col("referrer"), Urls.canonicalize(
              Urls.resolveHref(col("referrer"), col("href"))).as("url"))
            .withColumn("h", Urls.hostOf(col("url")))
            .filter(!Urls.hostBlocked(col("h"), blockedDomains))
            .select("url", "referrer")
          val notAdmitted = seen match {
            case Some(sn) => links.join(
              sn.distinct().withColumnRenamed("canon_url", "url"),
              Seq("url"), "left_anti")
            case None => links
          }
          notAdmitted
            .join(firstInBatch.select(col("canon_url").as("url")),
              Seq("url"), "left_anti")
            .write.mode("overwrite").parquet(s"$dd/batch_$batchId")
        }
        // fold accumulated deltas into the settled frontier (never
        // the in-flight batch — replay safety, see Frontier)
        Frontier.maybeSettle(spark, survivorDir, batchId,
          Seq("canon_url"), settleEvery)
        ()
      }
      .outputMode(OutputMode.Append())
      .start()
}
