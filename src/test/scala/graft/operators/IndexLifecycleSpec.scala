package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The monitor→artifact hinge (Similarity.refreshIvfPqIfDrifted):
  * below the drift threshold a refresh call is training-free and
  * idempotent — the corpus thunk is never evaluated and the stored
  * tables come back untouched; above it the model tables are dropped,
  * retrained from the corpus, and serving answers change. */
class IndexLifecycleSpec extends SparkSpec {

  import spark.implicits._

  private def cloud(n: Int, seed: Int, shift: Float = 0f): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(64)(shift + rng.nextGaussian().toFloat)))
  }

  private def root(tag: String) =
    s"${java.nio.file.Files.createTempDirectory(s"graft_lc_$tag")}"

  private val params = (2, 1, 4, 2, 1) // kc, coarseIters, m, k, iters

  test("below-threshold refresh is training-free and returns the stored model") {
    val (kc, ci, m, k, it) = params
    val tag = "lc_below"
    val corpus = cloud(200, 7).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, root(tag), tag, corpus, kc, ci, m, k, it, 2)
    val before = spark.table(s"ivfpq_cents_$tag").collect().toSet
    // the batch is the corpus itself — per-cell shares match, gap ~0
    val (_, cents, _, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, root(tag), tag,
      { throw new IllegalStateException("below-threshold refresh must not train") },
      corpus, maxShareGap = 0.5, kc, ci, m, k, it, 2)
    assert(!refreshed, "identical distribution must not trigger a rebuild")
    assert(cents.collect().toSet == before, "stored centroids returned untouched")
    // idempotent: a second call is equally training-free
    val (_, _, _, again) = Similarity.refreshIvfPqIfDrifted(
      spark, root(tag), tag,
      { throw new IllegalStateException("still must not train") },
      corpus, maxShareGap = 0.5, kc, ci, m, k, it, 2)
    assert(!again)
  }

  test("a failed rebuild leaves the stored model registered and serving") {
    val (kc, ci, m, k, it) = params
    val tag = "lc_fail"
    val r = root(tag)
    val corpus = cloud(200, 13).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, r, tag, corpus, kc, ci, m, k, it, 2)
    val before = spark.table(s"ivfpq_cents_$tag").collect().toSet
    val drifted = cloud(200, 13, shift = 3f).toDF("vec_id", "embedding")
    // the rebuild dies mid-train (above threshold, throwing corpus
    // thunk) — the staged swap must not have touched the serving model
    intercept[IllegalStateException] {
      Similarity.refreshIvfPqIfDrifted(spark, r, tag,
        { throw new IllegalStateException("rebuild dies mid-train") },
        drifted, maxShareGap = 0.2, kc, ci, m, k, it, 2)
    }
    assert(spark.catalog.tableExists(s"ivfpq_cents_$tag"),
      "serving model must survive a failed refresh")
    assert(spark.table(s"ivfpq_cents_$tag").collect().toSet == before,
      "stored centroids unchanged after the failed rebuild")
    // and a later healthy refresh still swaps in cleanly
    val (_, cents2, _, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag, drifted, drifted, maxShareGap = 0.2, kc, ci, m, k, it, 2)
    assert(refreshed)
    assert(cents2.collect().toSet != before, "healthy refresh retrains")
  }

  test("above-threshold refresh rebuilds the model and serving changes") {
    val (kc, ci, m, k, it) = params
    val tag = "lc_above"
    val r = root(tag)
    val corpus = cloud(200, 11).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, r, tag, corpus, kc, ci, m, k, it, 2)
    val before = spark.table(s"ivfpq_cents_$tag").collect()
      .map(row => (row.getLong(0), row.getSeq[Double](1))).toSet
    // a drifted world: every vector shifted to one side — the batch
    // piles into one stored cell (share gap → ~1), and the refreshed
    // corpus is the drifted cloud, so retraining provably moves cents
    val drifted = cloud(200, 11, shift = 3f).toDF("vec_id", "embedding")
    val (codes2, cents2, books2, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag, drifted, drifted,
      maxShareGap = 0.2, kc, ci, m, k, it, 2)
    assert(refreshed, "concentrated batch must exceed the share-gap threshold")
    val after = cents2.collect()
      .map(row => (row.getLong(0), row.getSeq[Double](1))).toSet
    assert(after != before, "rebuild must retrain the coarse centroids")
    // serving runs against the refreshed artifact
    val probe = Similarity.ivfPqProbe(codes2, cents2, books2,
      drifted.filter(col("vec_id") < 3), Similarity.lshDims / m, 1, 3)
    assert(probe.count() > 0, "refreshed model must serve probes")
    // and the monitor now reports calm: same batch, no further rebuild
    val (_, _, _, again) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag,
      { throw new IllegalStateException("post-refresh call must not retrain") },
      drifted, maxShareGap = 0.2, kc, ci, m, k, it, 2)
    assert(!again, "after the rebuild the drifted batch matches the new model")
  }

  test("stranded temp/aside tables from a crashed swap are cleaned and replaced") {
    val (kc, ci, m, k, it) = params
    val tag = "lc_strand"
    val r = root(tag)
    val corpus = cloud(200, 17).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, r, tag, corpus, kc, ci, m, k, it, 2)
    // simulate a refresh that crashed mid-swap: both a __new temp and
    // a __old aside left registered (contents irrelevant — the next
    // refresh must drop them before rebuilding)
    spark.sql(s"CREATE TABLE ivfpq_cents_${tag}__new AS SELECT 1 AS junk")
    spark.sql(s"CREATE TABLE ivfpq_books_${tag}__old AS SELECT 1 AS junk")
    val drifted = cloud(200, 17, shift = 3f).toDF("vec_id", "embedding")
    val (_, cents2, _, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag, drifted, drifted, maxShareGap = 0.2, kc, ci, m, k, it, 2)
    assert(refreshed)
    // the swap completed: no temp/aside names survive, the final
    // names serve the REBUILT model (not the stranded junk)
    for (t <- Seq("cents", "books", "codes"); suf <- Seq("__new", "__old"))
      assert(!spark.catalog.tableExists(s"ivfpq_${t}_$tag$suf"),
        s"stranded ivfpq_${t}_$tag$suf survived the refresh")
    assert(cents2.columns.toSeq != Seq("junk"))
    assert(spark.table(s"ivfpq_cents_$tag").count() > 0)
  }

  test("a crash between the two renames recovers automatically on the next call") {
    val (kc, ci, m, k, it) = params
    val tag = "lc_midswap"
    val r = root(tag)
    val corpus = cloud(200, 23).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, r, tag, corpus, kc, ci, m, k, it, 2)
    val before = spark.table(s"ivfpq_cents_$tag").collect().toSet
    // simulate the worst crash point: rename-aside done, rename-in not —
    // the final name is unbound and the model is live only as __old
    spark.sql(s"ALTER TABLE ivfpq_cents_$tag RENAME TO ivfpq_cents_${tag}__old")
    assert(!spark.catalog.tableExists(s"ivfpq_cents_$tag"))
    // the next refresh must rename __old back in BEFORE the existence
    // require (no manual catalog surgery), then proceed as normal —
    // here the batch matches the recovered model, so no retrain either
    val (_, cents, _, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag,
      { throw new IllegalStateException("recovery path must not train") },
      corpus, maxShareGap = 0.5, kc, ci, m, k, it, 2)
    assert(!refreshed)
    assert(cents.collect().toSet == before,
      "recovered model must be the pre-crash generation, bit-for-bit")
    assert(spark.catalog.tableExists(s"ivfpq_cents_$tag"))
    assert(!spark.catalog.tableExists(s"ivfpq_cents_${tag}__old"),
      "recovery renames the aside back in; it must not leave a copy")
  }

  test("a mid-loop crash recovers to ONE generation, never a mixed model") {
    val (kc, ci, m, k, it) = params
    val tag = "lc_mixed"
    val r = root(tag)
    val corpus = cloud(200, 29).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, r, tag, corpus, kc, ci, m, k, it, 2)
    // build the replacement generation exactly as a drifted refresh
    // does: temp names, non-serving generation dir
    val drifted = cloud(200, 29, shift = 3f).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, s"$r/gen_a", s"${tag}__new", drifted,
      kc, ci, m, k, it, 2)
    val newBooks = spark.table(s"ivfpq_books_${tag}__new").collect().toSet
    // simulate the advisor's crash point mid swap-loop: cents fully
    // swapped (aside dropped), books renamed-aside only, codes untouched
    spark.sql(s"ALTER TABLE ivfpq_cents_$tag RENAME TO ivfpq_cents_${tag}__old")
    spark.sql(s"ALTER TABLE ivfpq_cents_${tag}__new RENAME TO ivfpq_cents_$tag")
    spark.sql(s"DROP TABLE ivfpq_cents_${tag}__old")
    spark.sql(s"ALTER TABLE ivfpq_books_$tag RENAME TO ivfpq_books_${tag}__old")
    // the next call must complete the swap FORWARD (cents already
    // serves the new generation; renaming books' OLD aside back in
    // would quietly serve codes against the wrong centroids)
    val (_, _, books, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag,
      { throw new IllegalStateException("recovery must not retrain") },
      drifted, maxShareGap = 0.9, kc, ci, m, k, it, 2)
    assert(!refreshed)
    assert(books.collect().toSet == newBooks,
      "recovery must serve the NEW generation's books, not the old aside")
    // one generation end to end: all three finals share a parent dir
    val gens = Seq("cents", "books", "codes").map { t =>
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"ivfpq_${t}_$tag"))
        .location.toString.stripSuffix("/")
      loc.substring(0, loc.lastIndexOf('/'))
    }
    assert(gens.distinct.size == 1, s"mixed-generation serving set: $gens")
    for (t <- Seq("cents", "books", "codes"); suf <- Seq("__new", "__old"))
      assert(!spark.catalog.tableExists(s"ivfpq_${t}_$tag$suf"),
        s"recovery stranded ivfpq_${t}_$tag$suf")
  }

  test("a tag repeating a table-name word still derives correct swap names") {
    // tag "cents" makes the serving table ivfpq_cents_cents — the old
    // first-occurrence replace() derived ivfpq_cents__new_cents and
    // the swap lost track of it; suffix-anchored naming must survive
    // a full drift-triggered swap end to end
    val (kc, ci, m, k, it) = params
    val tag = "cents"
    val r = root(tag)
    val corpus = cloud(200, 11).toDF("vec_id", "embedding")
    Similarity.ensureIvfPqModel(spark, r, tag, corpus, kc, ci, m, k, it, 2)
    val drifted = cloud(200, 11, shift = 3f).toDF("vec_id", "embedding")
    val (_, _, _, refreshed) = Similarity.refreshIvfPqIfDrifted(
      spark, r, tag, drifted, drifted, maxShareGap = 0.2, kc, ci, m, k, it, 2)
    assert(refreshed)
    for (t <- Seq("cents", "books", "codes")) {
      assert(spark.catalog.tableExists(s"ivfpq_${t}_$tag"))
      for (suf <- Seq("__new", "__old"))
        assert(!spark.catalog.tableExists(s"ivfpq_${t}_$tag$suf"),
          s"swap stranded ivfpq_${t}_$tag$suf")
    }
  }
}
