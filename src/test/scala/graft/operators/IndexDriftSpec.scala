package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** The drift monitor must surface both failure modes of a stale
  * quantizer — occupancy shift (hot cells) and rising assignment
  * distance (centroids no longer describe the data) — and must keep
  * empty cells visible. */
class IndexDriftSpec extends SparkSpec {

  private def vec(theta: Double): Array[Float] = {
    val v = new Array[Float](Similarity.lshDims)
    v(0) = math.cos(theta).toFloat
    v(1) = math.sin(theta).toFloat
    v
  }

  private val half = math.Pi / 2

  private def fixture = {
    import spark.implicits._
    val cents = Seq(
      (0L, vec(0.0).map(_.toDouble).toSeq),
      (1L, vec(half).map(_.toDouble).toSeq)).toDF("centroid_id", "cent")
    // corpus: balanced and tight around both centroids
    val corpus = Seq(
      (0L, vec(0.05), "a"), (1L, vec(-0.05), "a"),
      (2L, vec(half - 0.05), "b"), (3L, vec(half + 0.05), "b")
    ).toDF("vec_id", "embedding", "label")
    // batch: everything crowds cell 1, and sits FARTHER from it
    val batch = Seq(
      (10L, vec(half - 0.4), "b"), (11L, vec(half + 0.4), "b"),
      (12L, vec(half - 0.5), "b")
    ).toDF("vec_id", "embedding", "label")
    (cents, corpus, batch)
  }

  test("occupancy shift and distance rise are both visible; empty cells stay") {
    val (cents, corpus, batch) = fixture
    val out = Similarity.indexDrift(cents, corpus, batch)
      .orderBy("centroid_id").collect()
    assert(out.length == 2, "every stored cell must appear")

    val Array(c0, c1) = out
    assert(c0.getAs[Long]("corpus_n") == 2 && c0.getAs[Long]("batch_n") == 0)
    assert(c1.getAs[Long]("corpus_n") == 2 && c1.getAs[Long]("batch_n") == 3)
    // the deserted cell keeps its row with a null batch distance
    assert(c0.isNullAt(c0.fieldIndex("batch_mean_dist")))
    // share_gap: corpus 50/50 vs batch 0/100 → 0.5 on both cells
    assert(math.abs(c0.getAs[Double]("share_gap") - 0.5) < 1e-9)
    assert(math.abs(c1.getAs[Double]("share_gap") - 0.5) < 1e-9)
    // the batch sits farther from the centroid it crowds
    assert(c1.getAs[Double]("batch_mean_dist") >
      c1.getAs[Double]("corpus_mean_dist") * 5)
  }

  test("an undrifted batch reads as zero gap and comparable distances") {
    val (cents, corpus, _) = fixture
    val out = Similarity.indexDrift(cents, corpus, corpus)
      .orderBy("centroid_id").collect()
    out.foreach { r: Row =>
      assert(r.getAs[Double]("share_gap") == 0.0)
      assert(r.getAs[Double]("batch_mean_dist") ==
        r.getAs[Double]("corpus_mean_dist"))
    }
  }
}
