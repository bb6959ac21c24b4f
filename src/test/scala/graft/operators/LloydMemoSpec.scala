package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Lloyd training memo's file-backed key must miss when a
  * memoized path is OVERWRITTEN in-session: the key carries a
  * per-file (length, mtime) content fingerprint, so mode=overwrite
  * (and the index-refresh gen ping-pong) can never be served the old
  * corpus's centroids — the round-11 latent hazard, closed. */
class LloydMemoSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(shift: Float) =
    (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1f else 10f
      (i, Array(base + shift + (i % 5) * 0.1f, base + 2f * shift + (i % 3) * 0.1f))
    }.toDF("vec_id", "embedding")

  test("overwriting a memoized parquet path yields fresh centroids, not stale ones") {
    val dir = java.nio.file.Files.createTempDirectory("lloyd_memo").toString

    corpus(0f).write.mode("overwrite").parquet(dir)
    val first = Similarity.lloydTrain(spark.read.parquet(dir), 3, iters = 3)

    // the memo serves a second read of the UNCHANGED path (pure
    // function: bit-identical either way; the fingerprint key makes
    // it a hit rather than a retrain)
    assert(Similarity.lloydTrain(spark.read.parquet(dir), 3, iters = 3) == first)

    // in-place overwrite with a genuinely different corpus: the
    // fingerprint (file lengths/mtimes changed) must MISS the memo
    corpus(3.5f).write.mode("overwrite").parquet(dir)
    val after = Similarity.lloydTrain(spark.read.parquet(dir), 3, iters = 3)

    // ground truth: train the new corpus from an untouched path
    val other = java.nio.file.Files.createTempDirectory("lloyd_memo_b").toString
    corpus(3.5f).write.mode("overwrite").parquet(other)
    val truth = Similarity.lloydTrain(spark.read.parquet(other), 3, iters = 3)

    assert(after == truth, "overwritten path must retrain on the NEW data")
    assert(after != first, "the two corpora train to different centroids")
  }
}
