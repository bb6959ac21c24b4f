package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (`Aggregator` — SURVEY §2.10): the reference has
  * no custom aggregates, but a grouped metric is the natural shape for
  * its driver-side forecast-error math, so the engine carries one
  * first-class example. Aggregators run as real Catalyst aggregates:
  * partial (map-side) buffers, merge on the reducer, codegen'd
  * buffer encoders — unlike a collect-then-fold they never move raw
  * rows.
  *
  * Numeric contract: the buffer is EXACT integer arithmetic (money in
  * cents × integer weight), so the partial/merge order that differs
  * run-to-run on a cluster can never change the result — the
  * float division happens once, in `finish`.
  */
object Aggregators {

  /** Weighted mean of a cents-valued measure: buffer = (Σ cents·w, Σ w). */
  object WeightedMeanCents extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) Double.NaN else r._1.toDouble / (100.0 * r._2)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
