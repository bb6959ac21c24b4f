package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the (possibly skewed) fact side
  * with a deterministic row hash in [0, salts), replicate the
  * build side × salts, and join on (key, salt). The result set is
  * identical to the plain join — salting only re-shapes the shuffle
  * so one hot key spreads over `salts` reducers instead of melting a
  * single task at 100 TB. AQE's skew-join handles moderate skew
  * automatically; explicit salting is for the pathological keys AQE
  * can't split (e.g. a single null-ish default key carrying 10% of
  * the table).
  */
object SkewedJoin {

  def saltedInner(fact: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn(
      "_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = build.withColumn(
      "_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
