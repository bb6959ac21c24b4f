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

  /** Salt every key (full replication ×salts). Correct but pays the
    * replication tax on cold keys too — prefer `saltedInnerHot`. */
  def saltedInner(fact: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn(
      "_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = build.withColumn(
      "_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Salt ONLY detected hot keys: a map-side-combined count pass finds
    * keys with ≥ hotThreshold fact rows (shuffled volume = distinct
    * keys per partition, not rows), the hot-key set broadcasts (tiny by
    * definition — hot means FEW keys carrying many rows), hot fact rows
    * get a random salt and only hot build rows replicate. Cold keys
    * join exactly as a plain shuffle join, so the replication tax is
    * proportional to the skew instead of ×salts on everything. The
    * result set is identical to the plain join either way. */
  def saltedInnerHot(fact: DataFrame, build: DataFrame, key: String,
                     salts: Int, hotThreshold: Long): DataFrame = {
    require(salts > 0 && hotThreshold > 0)
    val hot = fact.groupBy(key).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= hotThreshold)
      .select(col(key), lit(true).as("_hot"))
    val saltedFact = fact.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull,
          pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
        .otherwise(0L))
      .drop("_hot")
    val replicated = build.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt", explode(
        when(col("_hot").isNotNull, sequence(lit(0L), lit(salts.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .drop("_hot")
    saltedFact.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
