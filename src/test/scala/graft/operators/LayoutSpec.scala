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

  /** The full 128×128 plane, two rows per cell — uniform and genuinely
    * 2-D. (An affine scatter like (49i mod 128, 55i mod 128) is a trap
    * here: both coordinates are functions of i mod 128, so the points
    * collapse onto a 1-D lattice and ANY layout prunes it well.) */
  private def plane(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    (0 until (1 << 15)).map { i => ((i / 2) % 128, (i / 256) % 128) }.toDF("x", "y")
  }

  test("z-sorted files bound the NON-leading dimension; a lex sort cannot") {
    import spark.implicits._
    val rows = plane(spark)

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

  /** Per-file (min, max) of an int column, straight from the parquet
    * footers the files were written with — exactly the statistics a
    * data-skipping reader (Delta/Iceberg file pruning, parquet
    * row-group pruning) consults. */
  private def footerRanges(dir: String): Seq[Map[String, (Int, Int)]] = {
    import scala.collection.JavaConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq.map { f =>
        val rd = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try {
          val blocks = rd.getFooter.getBlocks.asScala.toSeq
          Seq("x", "y").map { c =>
            val stats = blocks.map(
              _.getColumns.asScala.find(_.getPath.toDotString == c).get.getStatistics)
            c -> (stats.map(_.genericGetMin.asInstanceOf[Integer].toInt).min,
                  stats.map(_.genericGetMax.asInstanceOf[Integer].toInt).max)
          }.toMap
        } finally rd.close()
      }
  }

  test("z-ordered files survive min/max pruning in fewer files than a lex sort") {
    val rows = plane(spark)
    val zDir = java.nio.file.Files.createTempDirectory("zorder_read").toString
    val lexDir = java.nio.file.Files.createTempDirectory("lexorder_read").toString
    Layout.zOrderedParquet(rows, zDir, col("x"), col("y"), nFiles = 64, bits = 7)
    rows.repartitionByRange(64, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(lexDir)

    def hits(r: (Int, Int), lo: Int, hi: Int) = r._1 <= hi && r._2 >= lo
    val (zR, lexR) = (footerRanges(zDir), footerRanges(lexDir))
    assert(zR.size == 64 && lexR.size == 64)

    // the operator's reason to exist: a 2-D box predicate prunes on
    // BOTH dimensions under z (square tiles), only on the leading one
    // under lex (full-height slabs)
    val zBox = zR.count(r => hits(r("x"), 32, 47) && hits(r("y"), 32, 47))
    val lexBox = lexR.count(r => hits(r("x"), 32, 47) && hits(r("y"), 32, 47))
    assert(zBox < lexBox,
      s"z box-pruning must beat lex ($zBox vs $lexBox files of 64)")

    // predicate on the NON-leading dimension alone: lex slabs span all
    // of y, so nothing prunes; z tiles bound y and shed most files
    val zY = zR.count(r => hits(r("y"), 32, 47))
    val lexY = lexR.count(r => hits(r("y"), 32, 47))
    assert(lexY == 64, s"lex slabs should be un-prunable on y (got $lexY)")
    assert(zY * 2 < lexY,
      s"z must prune on the non-leading dimension ($zY vs $lexY files of 64)")
  }
}
