package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Settled-frontier layout for the per-batch-overwrite streams: the
  * base+delta posture the persisted dedup index already uses, applied
  * to the streams' OWN output.
  *
  * Without it, every micro-batch anti-joins against the union of all
  * earlier `batch_*` dirs — O(#batches) listings and file opens per
  * batch, O(N²) over a run: a week-long crawl accretes thousands of
  * small parquet dirs and re-opens all of them every batch. With it,
  * every `settleEvery` batches the accumulated deltas fold into ONE
  * compacted `frontier_<m>` dir (m = the highest batch id folded in,
  * files sized toward the row-group sweet spot), and each batch reads
  * frontier + O(settleEvery) tail deltas — per-batch cost flat in the
  * number of batches (BASELINE.md#crawl_stream).
  *
  * Crash-safety is layout-encoded, no side ledger:
  *  - a frontier is LIVE only when its `_SUCCESS` marker exists (the
  *    normal parquet commit marker); a settle that dies mid-write
  *    leaves an incomplete dir the next settle simply overwrites;
  *  - the fold NEVER includes the in-flight batch (only ids strictly
  *    below it), so a foreachBatch retry across the settle boundary
  *    sees exactly the admitted state the first attempt saw — the
  *    frontier must not eat its own producer (BatchLayout's replay
  *    rule, lifted to the settled layout);
  *  - the dir NAME carries the folded-through id, so readers ignore
  *    any batch dir with id ≤ m even before it is garbage-collected —
  *    a crash between the frontier commit and the delta deletion can
  *    momentarily duplicate rows on disk but never in a read;
  *  - deletion is therefore pure GC, retried opportunistically on
  *    every later settle check.
  *
  * At deployment scale the anti-join right side still re-shuffles the
  * frontier keys each batch; a nightly job can additionally register
  * the frontier as a bucketed table on the admission key
  * (Bucketing.writeBucketed) to make that probe co-partitioned — the
  * layout here is the prerequisite either way.
  *
  * Public surface: [[readLayered]] is the consumer entry (the
  * stream's full admitted output), [[scopePaths]]/[[maybeSettle]]
  * the per-batch protocol the Ingest* twins run. */
object Frontier {

  /** Target compacted-file size for a settled frontier. */
  val targetFileBytes: Long = 128L * 1024 * 1024

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private final case class Layout(frontier: Option[(Long, Path)],
                                  deltas: Seq[(Long, Path)],
                                  stale: Seq[Path])

  private def numbered(p: Path, prefix: String): Option[(Long, Path)] =
    if (p.getName.startsWith(prefix))
      scala.util.Try(p.getName.stripPrefix(prefix).toLong).toOption.map(_ -> p)
    else None

  private def scan(spark: SparkSession, dir: String): Layout = {
    val root = new Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(root)) return Layout(None, Nil, Nil)
    val kids = fs.listStatus(root).filter(_.isDirectory).map(_.getPath).toSeq
    val frontiers = kids.flatMap(numbered(_, "frontier_"))
    val complete = frontiers.filter { case (_, p) =>
      fs.exists(new Path(p, "_SUCCESS"))
    }
    val latest = complete.sortBy(_._1).lastOption
    val m = latest.map(_._1).getOrElse(Long.MinValue)
    val (live, staleBatches) =
      kids.flatMap(numbered(_, "batch_")).partition(_._1 > m)
    // stale: batch dirs already folded into the live frontier, and
    // superseded frontier generations (complete or not) — content the
    // latest frontier fully contains; incomplete dirs ABOVE m are a
    // pending settle's target and are left for its overwrite
    val staleFrontiers = frontiers.filter(_._1 < m).map(_._2)
    Layout(latest, live.sortBy(_._1), staleBatches.map(_._2) ++ staleFrontiers)
  }

  /** The admitted-state scope for batch `batchId`, split into its two
    * layers: the latest settled frontier (folded-through id + path)
    * and the live delta paths — the CURRENT batch id excluded (a
    * retry must not probe its own partial output). */
  def scopeParts(spark: SparkSession, dir: String,
                 batchId: Long): (Option[(Long, String)], Seq[String]) = {
    val l = scan(spark, dir)
    (l.frontier.map { case (m, p) => (m, p.toString) },
      l.deltas.collect { case (id, p) if id != batchId => p.toString })
  }

  /** [[scopeParts]] flattened to one path list (frontier first).
    * None ⇒ nothing admitted yet. */
  def scopePaths(spark: SparkSession, dir: String,
                 batchId: Long): Option[Seq[String]] = {
    val (front, deltas) = scopeParts(spark, dir, batchId)
    val paths = front.map(_._2).toSeq ++ deltas
    if (paths.isEmpty) None else Some(paths)
  }

  /** Everything this stream has admitted — for consumers and serving
    * layers (frontier + every live delta, nothing excluded). */
  def readLayered(spark: SparkSession, dir: String): DataFrame = {
    val l = scan(spark, dir)
    val paths = l.frontier.map(_._2.toString).toSeq ++ l.deltas.map(_._2.toString)
    require(paths.nonEmpty, s"no settled frontier or batch deltas under $dir")
    spark.read.parquet(paths: _*)
  }

  /** Settle check, called at the end of each foreachBatch body: GC
    * stale dirs, and when ≥ `every` deltas with id < `batchId` have
    * accumulated, fold frontier + those deltas into `frontier_<m>`
    * (m = highest folded id — strictly below the in-flight batch) and
    * delete them. `key` names the row identity for the fold's safety
    * dedup; rows are key-disjoint by construction (each delta was
    * anti-joined against the scope that produced it), so the
    * dropDuplicates rides the fold's own key shuffle and never
    * changes a healthy fold's content. Returns whether it settled. */
  def maybeSettle(spark: SparkSession, dir: String, batchId: Long,
                  key: Seq[String], every: Int): Boolean = {
    require(every >= 1, s"settleEvery must be >= 1, got $every")
    val l = scan(spark, dir)
    val fs = fsOf(spark, dir)
    l.stale.foreach(p => fs.delete(p, true))
    val foldable = l.deltas.filter(_._1 < batchId)
    if (foldable.size < every) return false
    val m = foldable.map(_._1).max
    val in = l.frontier.map(_._2).toSeq ++ foldable.map(_._2)
    val bytes = in.map(p => fs.getContentSummary(p).getLength).sum
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    import org.apache.spark.sql.functions.col
    spark.read.parquet(in.map(_.toString): _*)
      .repartition(nFiles, key.map(col): _*)
      .dropDuplicates(key)
      .write.mode("overwrite").parquet(s"$dir/frontier_$m")
    foldable.foreach { case (_, p) => fs.delete(p, true) }
    l.frontier.foreach { case (_, p) => fs.delete(p, true) }
    true
  }
}
