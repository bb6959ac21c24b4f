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
  * result. */
private[streaming] object BatchLayout {

  /** Paths of `dir/batch_<k>` outputs for k ≠ batchId, None when no
    * earlier batch has landed (first batch of the run). */
  def earlierBatches(spark: SparkSession, dir: String,
                     batchId: Long): Option[Seq[String]] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val kids = fs.listStatus(path)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("batch_") &&
        st.getPath.getName != s"batch_$batchId")
      .map(_.getPath.toString).toSeq
    if (kids.isEmpty) None else Some(kids)
  }
}
