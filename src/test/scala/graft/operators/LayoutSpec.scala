package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Morton key's two contracts: it IS the standard bit interleave
  * (checked against an independent driver-side implementation over a
  * grid), and sorting by it actually buys 2-D locality — per-file
  * (x, y) bounding boxes must be far tighter than a lexicographic
  * x-sort's, which is the whole reason to Z-order a layout. */
class LayoutSpec extends SparkSpec {

  private def mortonRef(x: Int, y: Int, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zOrderKey2 matches the reference interleave over a 64x64 grid") {
    import spark.implicits._
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
        Layout.zOrderKey2(col("x"), col("y"), 6).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    (0 until 64).foreach { x =>
      (0 until 64).foreach { y =>
        assert(got((x, y)) == mortonRef(x, y, 6))
      }
    }
    // bijective on the grid: 4096 distinct keys in [0, 4096)
    assert(got.values.toSet.size == 4096 && got.values.max == 4095L)
  }

  test("z-sorted files bound the NON-leading dimension; a lex sort cannot") {
    import spark.implicits._
    val n = 1 << 14
    val rows = (0 until n).map { i =>
      // deterministic scatter over a 128x128 plane
      ((i * 2654435761L % 128).toInt, (i * 40503L % 128).toInt)
    }.toDF("x", "y")

    // per-"file" y-extent: what a min/max-stats reader can prune a
    // y-predicate with. On uniform data both layouts tile the plane
    // into equal-AREA regions, but lex slabs are full-height (y spans
    // everything → zero pruning on y) while Z tiles are square.
    def meanYExtent(sorted: org.apache.spark.sql.DataFrame): Double = {
      val parts = 16
      val binned = sorted.withColumn("part", ntile(parts).over(
        org.apache.spark.sql.expressions.Window.orderBy("sortkey")))
      val exts = binned.groupBy("part")
        .agg((max(col("y")) - min(col("y")) + 1).as("yext"))
        .collect().map(_.getAs[Int]("yext").toDouble)
      exts.sum / exts.length
    }

    val zExt = meanYExtent(rows.withColumn("sortkey",
      Layout.zOrderKey2(col("x"), col("y"), 7)))
    val lexExt = meanYExtent(rows.withColumn("sortkey",
      col("x").cast("long") * 128 + col("y")))
    assert(zExt < lexExt / 2,
      f"z tiles must bound y where lex slabs sprawl it (z=$zExt%.0f lex=$lexExt%.0f)")
  }
}
