package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, lit, row_number}

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
  *    every later settle check;
  *  - a batch id AT OR BELOW the settled frontier id is a protocol
  *    violation (a stream restarted with a wiped checkpoint over an
  *    existing output dir restarts ids at 0): [[scopeParts]] and
  *    [[maybeSettle]] fail loudly instead of letting the next settle
  *    silently GC the new run's freshly-admitted batch dirs.
  *
  * The fold is DETERMINISTIC latest-wins: every input dir is tagged
  * with its generation id (the frontier with its folded-through id,
  * each delta with its batch id) and the row from the HIGHEST
  * generation wins per key. For the anti-joined streams (crawl /
  * dedup / curation) deltas are key-disjoint by construction and this
  * changes nothing; for re-submittable streams (a doc re-scored in a
  * later batch, a vec_id re-ingested with an updated embedding) it
  * pins the fold to the newest row, so consumer-visible state is the
  * same before and after a settle given consumers read latest-wins.
  * Within ONE batch dir keys are unique by each producer's contract
  * (every Ingest* twin writes an aggregated or deduped frame).
  *
  * With `buckets > 0` the fold additionally lands the frontier as a
  * catalog-registered parquet table BUCKETED AND SORTED on `key`
  * (same dir, same `_SUCCESS` commit, same crash story — the catalog
  * entry is just metadata over `frontier_<m>`). A per-batch anti-join
  * probe that reads the frontier through [[frontierFrame]] is then
  * co-partitioned: the scan satisfies the join's distribution AND
  * ordering, so the frontier side needs NO exchange and NO sort —
  * only the (small) batch side shuffles. Without this, the probe
  * re-shuffles the whole admitted corpus every micro-batch — the one
  * per-batch cost term that grows without bound over a long crawl.
  *
  * Public surface: [[readLayered]] is the consumer entry (the
  * stream's full admitted output), [[scopeParts]]/[[maybeSettle]]
  * the per-batch protocol the Ingest* twins run, [[frontierFrame]]
  * the probe-side read. */
object Frontier {

  /** Target compacted-file size for a settled frontier. */
  val targetFileBytes: Long = 128L * 1024 * 1024

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirHash(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** Catalog name of the bucketed settled-frontier table for
    * generation `m` of `dir` (only exists when the settle that wrote
    * `frontier_<m>` ran with `buckets > 0`). */
  def tableName(dir: String, m: Long): String =
    s"graft_frontier_${dirHash(dir)}_$m"

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

  /** Fail loudly when `batchId` is at or below the settled frontier
    * id: ids below m only arise when a restarted stream's checkpoint
    * was wiped while the output dir survived — continuing would let
    * the next settle GC the new run's output as "already folded". */
  private def guardRestart(l: Layout, dir: String, batchId: Long): Unit =
    l.frontier.foreach { case (m, _) =>
      require(batchId > m,
        s"batch id $batchId is at or below the settled frontier id $m " +
          s"under $dir — the stream's checkpoint restarted below its " +
          "output dir's history (wiped checkpoint over a kept output " +
          "dir?); refusing to run: the next settle would silently GC " +
          "this run's batches. Point the stream at a fresh output dir " +
          "or restore the checkpoint.")
    }

  /** The admitted-state scope for batch `batchId`, split into its two
    * layers: the latest settled frontier (folded-through id + path)
    * and the live delta paths — the CURRENT batch id excluded (a
    * retry must not probe its own partial output). */
  def scopeParts(spark: SparkSession, dir: String,
                 batchId: Long): (Option[(Long, String)], Seq[String]) = {
    val l = scan(spark, dir)
    guardRestart(l, dir, batchId)
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

  /** The settled frontier for the PROBE side of a per-batch join:
    * the bucketed catalog table when generation `m` was settled with
    * `buckets > 0` in this session (scan co-partitioned and
    * pre-sorted on the key — zero exchange above it in an equi-join),
    * the plain path read otherwise (a restarted session loses the
    * in-memory catalog entry; the next settle re-registers it). */
  def frontierFrame(spark: SparkSession, dir: String, m: Long,
                    path: String): DataFrame =
    if (spark.catalog.tableExists(tableName(dir, m))) spark.table(tableName(dir, m))
    else spark.read.parquet(path)

  /** Everything this stream has admitted — for consumers and serving
    * layers (frontier + every live delta, nothing excluded). The read
    * tolerates files GC'd between path resolution and scan
    * (`ignoreMissingFiles`): a concurrent settle deletes folded delta
    * dirs after its frontier commit, and the dir-name rule already
    * guarantees a re-list never duplicates rows — so a serving reader
    * racing a settle skips the vanished files instead of dying
    * mid-scan on FileNotFoundException. */
  def readLayered(spark: SparkSession, dir: String): DataFrame = {
    val l = scan(spark, dir)
    val paths = l.frontier.map(_._2.toString).toSeq ++ l.deltas.map(_._2.toString)
    require(paths.nonEmpty, s"no settled frontier or batch deltas under $dir")
    // mergeSchema: layers may differ by an appended optional column
    // (a mid-run producer upgrade — the r20 `tombstone` marker); the
    // default first-file schema would silently drop it and resurrect
    // erased rows. Footer merging is bounded by the settle cadence
    // (frontier + ≤ settleEvery deltas).
    val raw = spark.read
      .option("ignoreMissingFiles", "true")
      .option("mergeSchema", "true")
      .parquet(paths: _*)
    // tombstone rows (r20 — the erase markers [[maybeSettle]]
    // compacts away) are markers, not content: hide them. Erasure of
    // the key's OLDER layers takes effect at the next settle (the
    // fold has the generation order this flat union deliberately does
    // not reconstruct — consumers of a pre-settle layered read see
    // every live version, per this function's contract).
    if (!raw.columns.contains("tombstone")) raw
    else raw.filter(!coalesce(col("tombstone"), lit(false)))
      .drop("tombstone")
  }

  /** Settle check, called at the end of each foreachBatch body: GC
    * stale dirs, and when ≥ `every` deltas with id < `batchId` have
    * accumulated, fold frontier + those deltas into `frontier_<m>`
    * (m = highest folded id — strictly below the in-flight batch) and
    * delete them. `key` names the row identity; the fold keeps the
    * row from the HIGHEST generation per key (deterministic
    * latest-wins — see the object scaladoc), riding the fold's own
    * key shuffle: for key-disjoint deltas (the anti-joined streams)
    * this never changes a healthy fold's content. With `buckets > 0`
    * the frontier lands as a bucketed+sorted catalog table (see the
    * object scaladoc) with exactly `buckets` files; otherwise file
    * count is sized by bytes toward [[targetFileBytes]]. Returns
    * whether it settled. */
  def maybeSettle(spark: SparkSession, dir: String, batchId: Long,
                  key: Seq[String], every: Int, buckets: Int = 0): Boolean = {
    require(every >= 1, s"settleEvery must be >= 1, got $every")
    val l = scan(spark, dir)
    guardRestart(l, dir, batchId)
    val fs = fsOf(spark, dir)
    l.stale.foreach(p => fs.delete(p, true))
    val foldable = l.deltas.filter(_._1 < batchId)
    if (foldable.size < every) return false
    val m = foldable.map(_._1).max
    val in = l.frontier.toSeq ++ foldable
    val bytes = in.map { case (_, p) => fs.getContentSummary(p).getLength }.sum
    val nFiles = if (buckets > 0) buckets
      else math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    // deterministic latest-wins: tag each input dir with its
    // generation id, keep the max-generation row per key. One
    // exchange (reused by the window) + one sort — the same shuffle
    // the old dropDuplicates paid, now with a pinned winner.
    // allowMissingColumns: a producer may upgrade its delta schema
    // mid-run (r20: the crawl survivor sink added `tombstone`); dirs
    // written before the upgrade union in with NULL for the new
    // column, which every consumer of an optional column already
    // coalesces over.
    val tagged = in.map { case (gen, p) =>
      spark.read.parquet(p.toString).withColumn("__gen", lit(gen))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = Window.partitionBy(key.map(col): _*).orderBy(col("__gen").desc)
    val folded0 = tagged
      .repartition(nFiles, key.map(col): _*)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__gen", "__rk")
    // deletion markers (r20): a delta row with `tombstone = true` is
    // a log-compaction ERASE of its key — when it wins latest-wins,
    // the key leaves the settled frontier entirely (the crawl stream
    // writes one when a refetched page gains `noindex`: compliance
    // says drop the retained copy, not just stop updating it). The
    // column survives in the settled schema (all false) so layered
    // reads stay union-compatible with the live deltas.
    val folded =
      if (!folded0.columns.contains("tombstone")) folded0
      else folded0.filter(!coalesce(col("tombstone"), lit(false)))
    if (buckets > 0)
      // repartition(buckets, key) aligns task ↔ bucket (same
      // murmur3-pmod), so each bucket is ONE file and the scan
      // reports its sort order — the Bucketing.writeBucketed layout,
      // inlined here to share the fold's single exchange
      folded.write.mode("overwrite")
        .option("path", s"$dir/frontier_$m")
        .bucketBy(buckets, key.head, key.tail: _*)
        .sortBy(key.head, key.tail: _*)
        .format("parquet")
        .saveAsTable(tableName(dir, m))
    else
      folded.write.mode("overwrite").parquet(s"$dir/frontier_$m")
    foldable.foreach { case (_, p) => fs.delete(p, true) }
    l.frontier.foreach { case (_, p) => fs.delete(p, true) }
    dropSupersededTables(spark, dir, m)
    true
  }

  /** GC catalog entries of superseded frontier generations (their
    * dirs are deleted above; a dangling table would break a later
    * `tableExists`-guarded read). */
  private def dropSupersededTables(spark: SparkSession, dir: String,
                                   m: Long): Unit = {
    val marker = s"graft_frontier_${dirHash(dir)}_"
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(marker))
      .foreach { t =>
        val gen = scala.util.Try(t.stripPrefix(marker).toLong)
        if (gen.toOption.exists(_ < m)) spark.sql(s"DROP TABLE IF EXISTS $t")
      }
  }
}
