package graft.operators

import graft.SparkSpec

/** The resize kernel is real index math, so it gets real fixtures:
  * a hand-checkable gather and the identity law. */
class MultimodalResizeSpec extends SparkSpec {

  test("nearest-neighbor downsample gathers the exact source samples") {
    import spark.implicits._
    // 4x2, 1 channel: rows [0 1 2 3] / [4 5 6 7]; 2x1 output takes
    // floor-mapped sources (0·2/1=0 ⇒ row 0; x=0→src 0, x=1→src 2)
    val px = Array.tabulate[Byte](8)(_.toByte)
    val in = Seq(Multimodal.PixelBuffer(1L, 4, 2, 1, px)).toDS()
    val out = Multimodal.resizeNearest(in, 2, 1).collect().head
    assert((out.width, out.height, out.channels) == ((2, 1, 1)))
    assert(out.pixels.toSeq == Seq[Byte](0, 2))
  }

  test("identity resize returns the buffer unchanged") {
    import spark.implicits._
    val px = Array.tabulate[Byte](16 * 12 * 3)(i => (i % 251).toByte)
    val in = Seq(Multimodal.PixelBuffer(7L, 16, 12, 3, px)).toDS()
    val out = Multimodal.resizeNearest(in, 16, 12).collect().head
    assert(out.pixels.toSeq == px.toSeq)
  }

  test("channels stay interleaved: each output sample keeps its channel") {
    import spark.implicits._
    // 2x2x3 where pixel (y,x) has channel values (10yx+c): downsample
    // to 1x1 must return pixel (0,0)'s three channel values intact
    val px = Array.tabulate[Byte](12) { i =>
      val (p, c) = (i / 3, i % 3)
      (p * 10 + c).toByte
    }
    val in = Seq(Multimodal.PixelBuffer(2L, 2, 2, 3, px)).toDS()
    val out = Multimodal.resizeNearest(in, 1, 1).collect().head
    assert(out.pixels.toSeq == Seq[Byte](0, 1, 2))
  }
}
