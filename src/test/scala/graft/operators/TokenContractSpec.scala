package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The single-space tokenization contract (TextAnalysis.singleSpaced)
  * made explicit three ways: `cleaned` ESTABLISHES it on arbitrary
  * raw text; splitting cleaned text on ' ' equals the
  * whitespace-class tokenization of the raw text (the generalization
  * a \\s+-aware walk would compute); and the byte-walk kernels agree
  * with their exploded twins EVEN on violating input, so a missed
  * normalize degrades consistently, never divergently. */
class TokenContractSpec extends SparkSpec {

  import spark.implicits._

  private val nasty: Seq[(Long, String)] = Seq(
    (0L, "plain single spaced words"),
    (1L, "tab\tseparated\tand  doubled"),
    (2L, "\n leading newline and trail \t"),
    (3L, "mixed  vertical \f feed \r cr"),
    (4L, "nbsp joined pair"),
    (5L, ""), (6L, "   "), (7L, "Punct!And?Caps MiXeD 42x"))

  test("cleaned establishes the singleSpaced contract on arbitrary raw text") {
    val df = nasty.toDF("id", "raw")
    val out = df.select(col("id"),
        TextAnalysis.cleaned(col("raw")).as("c"))
      .withColumn("ok", TextAnalysis.singleSpaced(col("c")))
      .collect()
    out.foreach(r => assert(r.getBoolean(2),
      s"cleaned('${nasty(r.getLong(0).toInt)._2}') = '${r.getString(1)}' violates"))
    // and the raw rows that DO violate are flagged by the guard
    val flags = df.select(col("id"), TextAnalysis.singleSpaced(col("raw")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(0L) && flags(7L), "clean raw text passes the guard")
    Seq(1L, 2L, 3L, 4L, 6L).foreach(i =>
      assert(!flags(i), s"row $i should violate the contract"))
  }

  test("single-space tokens of cleaned == whitespace-class tokens of raw") {
    // the generalization equivalence: normalize-first + split(' ')
    // computes exactly what a \s+-aware token walk over the
    // char-cleaned raw text would — so the kernels' single-space walk
    // loses nothing against a whitespace-class-aware variant
    val df = nasty.toDF("id", "raw")
    val got = df.select(col("id"),
        split(TextAnalysis.cleaned(col("raw")), " ").as("a"),
        // char-clean WITHOUT collapsing, strip boundary whitespace of
        // EVERY class (Spark trim only eats 0x20), split on the class
        split(regexp_replace(
            regexp_replace(lower(col("raw")), "[^a-z0-9\\s]", " "),
            "^\\s+|\\s+$", ""),
          "\\s+").as("b"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"row ${r.getLong(0)}: ${r.getSeq[String](1)} != ${r.getSeq[String](2)}")
    }
  }

  test("kernels and exploded twins agree even on contract-violating input") {
    val df = nasty.filter(_._2 != null).toDF("doc_id", "text")
    // minhash: same signature rows on both paths
    val k1 = Dedup.minhashSignatures(df, col("text"), col("doc_id"), 2)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val e1 = Dedup.minhashSignaturesExploded(df, col("text"), col("doc_id"), 2)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(k1 == e1)
    // simhash
    val k2 = Dedup.simhash(df, col("text"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e2 = Dedup.simhashExploded(df, col("text"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k2 == e2)
    // hash-embed
    val k3 = graft.operators.Rag.hashEmbed(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val e3 = graft.operators.Rag.hashEmbedExploded(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(k3 == e3)
  }
}
