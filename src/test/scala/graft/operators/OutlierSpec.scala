package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** 3σ assignment-outlier gate laws. */
class OutlierSpec extends SparkSpec {

  import spark.implicits._

  test("a planted off-manifold vector is flagged; the tight mass is not") {
    val rng = new scala.util.Random(41)
    val base = Array.fill(64)(rng.nextGaussian().toFloat)
    // 200 tight vectors around one direction + one inverted defect
    val cloud = (0 until 200).map { i =>
      (i.toLong, base.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }
    val defect = Seq((999L, base.map(x => -x)))
    val df = (cloud ++ defect).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 1, iters = 2).toDF("centroid_id", "cent")
    val out = Similarity.assignmentOutliers(Similarity.lloydAssignDist(df, cents))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(999L), "the inverted vector sits far above the cell mean")
    assert(out.count(_._2) <= 3, s"the tight mass stays unflagged: ${out.filter(_._2)}")
  }

  test("zero-variance cells flag nothing (the strict one-sided inequality)") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat)
    val df = (0 until 20).map(i => (i.toLong, v.map(_ * (i + 1)))).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 1, iters = 1).toDF("centroid_id", "cent")
    val out = Similarity.assignmentOutliers(Similarity.lloydAssignDist(df, cents))
    // scaled copies of one direction: every cosine distance identical
    assert(out.filter(col("is_outlier")).count() == 0)
  }

  test("the gate is one-sided: each cell's closest vector is never flagged") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.lloydTrain(e, 4, iters = 2).toDF("centroid_id", "cent")
    val flagged = Similarity.assignmentOutliers(Similarity.lloydAssignDist(e, cents))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("centroid_id")
          .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rk") === 1 && col("is_outlier"))
    assert(flagged.count() == 0)
  }
}
