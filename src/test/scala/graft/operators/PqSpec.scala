package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: complete code coverage, code-range bounds,
  * determinism, and ADC finding planted structure. */
class PqSpec extends SparkSpec {

  import spark.implicits._

  // 12 vectors of 8 dims in two well-separated families so 2-code
  // codebooks must split them
  private def corpus() = {
    val rows = (0 until 12).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, (0 until 8).map(d => base * (1.0f + 0.01f * ((i + d) % 3))).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("every vector gets exactly one code per subspace, codes within k") {
    val codes = Similarity.pqEncode(corpus(), m = 4, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.length == 12 * 4)
    assert(codes.map(c => (c._1, c._2)).distinct.length == 48)
    assert(codes.forall(c => c._3 >= 0 && c._3 < 2))
    // the two sign families land on different codes in every subspace
    val bySub = codes.groupBy(_._2)
    bySub.values.foreach { cs =>
      val pos = cs.filter(c => c._1 % 2 == 0).map(_._3).toSet
      val neg = cs.filter(c => c._1 % 2 == 1).map(_._3).toSet
      assert(pos.size == 1 && neg.size == 1 && pos != neg,
        "separable families must quantize apart")
    }
  }

  test("ADC ranks same-family vectors ahead of the other family") {
    val out = Similarity.pqAdcTopK(corpus(),
        corpus().filter(col("vec_id") === 0), m = 4, k = 2, iters = 2,
        topK = 5)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.length == 5)
    // all top-5 neighbors of an even (positive-family) query are even
    assert(out.forall(_._1 % 2 == 0), s"cross-family leak: ${out.toSeq}")
  }

  test("training and encoding are deterministic across invocations") {
    val a = Similarity.pqEncode(corpus(), 2, 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Similarity.pqEncode(corpus(), 2, 2, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
