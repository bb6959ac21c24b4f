package graft.streaming

import org.apache.spark.sql.SparkSession

/** Earlier-batch artifact listing for the per-batch-overwrite layout
  * every foreachBatch pipeline here uses.
  *
  * Why not a bare `batch_*` glob: foreachBatch is at-least-once, and
  * a RETRY of batch N re-runs after batch N's (possibly partial)
  * output already landed. A glob that includes `batch_N` feeds the
  * batch's own previous output into its "already admitted / already
  * settled" scope — a keep-first anti-join then empties the batch on
  * replay (the admitted state eats its own producer), and a monotone
  * boundary probe rejects its own keys. Excluding the CURRENT batch
  * id restores true replay idempotence: the retry sees exactly the
  * state the first attempt saw, and the overwrite lands the identical
  * result.
  *
  * The listing is [[Frontier]]-aware: once a stream settles, the scope
  * is the latest `frontier_<m>` dir plus the live tail deltas —
  * O(settleEvery) paths however long the stream has run, instead of
  * every batch dir ever written. */
private[streaming] object BatchLayout {

  /** Admitted-state paths for batch `batchId` (settled frontier +
    * `dir/batch_<k>` deltas, k ≠ batchId), None when nothing has
    * landed yet (first batch of the run). */
  def earlierBatches(spark: SparkSession, dir: String,
                     batchId: Long): Option[Seq[String]] =
    Frontier.scopePaths(spark, dir, batchId)
}
