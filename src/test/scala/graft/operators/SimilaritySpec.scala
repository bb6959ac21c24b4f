package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.fastCosine

/** IVF centroid training: k-means centroids must produce a tighter
  * partition of the corpus than arbitrary seed vectors, and the
  * assignment must cover every vector with exactly k clusters. */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def meanAssignedDist(centroids: org.apache.spark.sql.DataFrame): Double = {
    val e = Tables(spark, sf, "embeddings")
    Similarity.ivfAssign(e, centroids)
      .join(broadcast(centroids.withColumnRenamed("embedding", "ce")), Seq("centroid_id"))
      .select((lit(1.0) - fastCosine(col("embedding"), col("ce"))).as("d"))
      .agg(avg(col("d"))).collect()(0).getDouble(0)
  }

  test("k-means centroids beat naive seed vectors and cover the corpus") {
    val e = Tables(spark, sf, "embeddings")
    val n = e.count()
    val trained = Similarity.trainCentroids(e, 4)
    assert(trained.count() == 4)

    val assigned = Similarity.ivfAssign(e, trained)
    assert(assigned.count() == n, "every vector must land in a cell")
    assert(assigned.select("centroid_id").distinct().count() == 4,
      "k-means cells must all be populated")

    val naive = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    assert(meanAssignedDist(trained) < meanAssignedDist(naive),
      "trained centroids should partition tighter than arbitrary seeds")
  }

  test("trainCentroids is deterministic under a fixed seed") {
    val e = Tables(spark, sf, "embeddings")
    val a = Similarity.trainCentroids(e, 3).collect().map(_.toSeq).toSet
    val b = Similarity.trainCentroids(e, 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
