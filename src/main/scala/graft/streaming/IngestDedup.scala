package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.Dedup

/** Continuous-ingestion dedup: the streaming composition of the
  * incremental operators (SURVEY §2.9 capability growth — the
  * reference's per-day reload loop, made a stream).
  *
  * Every micro-batch of documents is dedup'd against three scopes:
  * (a) the SETTLED corpus index — an immutable artifact of the
  * previous pipeline run (Dedup.ensurePersistedIndex's bucketed
  * tables at scale); (b) itself (min doc_id wins); and (c) everything
  * this stream has already accepted, so a later batch cannot re-admit
  * a duplicate of an earlier batch's survivor. Survivors land under
  * `survivorDir/batch_<id>` with per-batch overwrite, which makes
  * foreachBatch's at-least-once retries idempotent — the delta state
  * IS the sink, no side ledger to reconcile.
  *
  * Scale shape: scope (a) is the batch-driven persisted-index probe
  * (cost ∝ |batch|); scope (c) probes the latest settled [[Frontier]]
  * plus at most `settleEvery` tail deltas — every `settleEvery`
  * batches the accepted deltas fold into one compacted
  * `frontier_<m>` dir, so the per-batch probe reads O(1) sources
  * however long the stream has run (the same base+delta posture as
  * scope (a), applied to the stream's own output). Consumers read
  * the accepted corpus via [[Frontier.readLayered]].
  */
object IngestDedup {

  def dedupedIngest(docs: DataFrame, index: Dedup.CorpusIndex,
                    survivorDir: String, n: Int = 3,
                    threshold: Double = 0.3,
                    settleEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val text = col("text")
        val id = col("doc_id")
        val vsCorpus = Dedup.incremental(index, batch.toDF(), text, id, n, threshold)
        // earlier survivors act as settled corpus too (the CURRENT
        // batch id excluded — an at-least-once retry must not dedup
        // the batch against its own partial output, which would empty
        // it on replay; see BatchLayout/Frontier). The settled
        // frontier probes through its PERSISTED index (built once per
        // settle window — FrontierIndex); only the short un-settled
        // tail is indexed in-plan, so per-batch compute is
        // ∝ |batch| + |tail|, flat in the accepted corpus.
        val (frontIdx, tailPaths) = FrontierIndex.dedupScope(
          spark, survivorDir, batchId, text, id, n)
        val vsFrontier = frontIdx match {
          case Some(fi) => Dedup.incremental(fi, vsCorpus, text, id, n, threshold)
          case None => vsCorpus
        }
        val out =
          if (tailPaths.isEmpty) vsFrontier
          else Dedup.incremental(
            spark.read.parquet(tailPaths: _*).select(batch.columns.map(col): _*),
            vsFrontier, text, id, n, threshold)
        out.write.mode("overwrite").parquet(s"$survivorDir/batch_$batchId")
        Frontier.maybeSettle(spark, survivorDir, batchId,
          Seq("doc_id"), settleEvery)
        ()
      }
      .outputMode(OutputMode.Append())
      .start()
}
