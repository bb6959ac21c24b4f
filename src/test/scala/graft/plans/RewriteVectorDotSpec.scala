package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The optimizer rule must turn the portable lambda dot pattern into
  * the native kernel without changing results. */
class RewriteVectorDotSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lambda dot pattern rewrites to FloatVectorDot and results are identical") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteVectorDot
    try {
      val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      val df = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          VectorFunctions.dot(col("a.embedding"), col("b.embedding")).as("dp"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("floatvectordot"),
        s"pattern not rewritten:\n$optimized")

      // numeric parity with the un-rewritten lambda form
      val plain = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(graft.functions.VectorFunctions
          .dot(col("a.embedding"), col("b.embedding")).as("dp"))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteVectorDot)
      val expected = plain.collect().map(_.getDouble(0)).sorted
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteVectorDot
      val got = df.collect().map(_.getDouble(2)).sorted
      assert(got.toSeq == expected.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteVectorDot)
    }
  }
}
