package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN-index maintenance: probing base ∪ streamed deltas
  * must equal probing an index built over the full corpus in one
  * batch; earlier fragments stay byte-stable under later batches.
  */
class IngestAnnIndexSpec extends SparkSpec {

  // deterministic vectors at the engine's index width (lshBucket
  // projects against lshDims-dim planes), two loose direction families
  private def vec(i: Int): Array[Float] =
    (0 until Similarity.lshDims).map { d =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      s * (1.0f + 0.07f * ((i * 3 + d * 5) % 11))
    }.toArray

  test("probe over base + streamed deltas equals one-shot index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_ann").toString

    val base = (0 until 10).map(i => (i.toLong, vec(i)))
    val d1 = (10 until 16).map(i => (i.toLong, vec(i)))
    val d2 = (16 until 24).map(i => (i.toLong, vec(i)))

    val baseIdx = Similarity.annIndexFrame(base.toDF("vec_id", "embedding"))

    val input = MemoryStream[(Long, Array[Float])]
    val q = IngestAnnIndex.indexedIngest(
      input.toDF().toDF("vec_id", "embedding"), dir)
    try {
      input.addData(d1: _*); q.processAllAvailable()
      val frag0 = spark.read.parquet(s"$dir/batch_0")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      input.addData(d2: _*); q.processAllAvailable()
      // batch-0's fragment is immutable under later batches
      val frag0Again = spark.read.parquet(s"$dir/batch_0")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(frag0Again == frag0 && frag0.size == 6)
    } finally q.stop()

    val serving = IngestAnnIndex.servingIndex(spark, Some(baseIdx), dir)
    val queries = (base ++ d1 ++ d2).take(5).toDF("vec_id", "embedding")
    val got = Similarity.lshAnnProbe(serving, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    val full = (base ++ d1 ++ d2).toDF("vec_id", "embedding")
    val want = Similarity.lshAnnFor(full, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("delta-only serving works; empty dir without base throws") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_ann2").toString
    assertThrows[IllegalStateException] {
      IngestAnnIndex.servingIndex(spark, None, dir)
    }
    val input = MemoryStream[(Long, Array[Float])]
    val q = IngestAnnIndex.indexedIngest(
      input.toDF().toDF("vec_id", "embedding"), dir)
    try {
      input.addData((0 until 8).map(i => (i.toLong, vec(i))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val serving = IngestAnnIndex.servingIndex(spark, None, dir)
    assert(serving.count() == 8)
    assert(serving.columns.toSet == Set("vec_id", "embedding", "bucket", "nrm"))
  }
}
