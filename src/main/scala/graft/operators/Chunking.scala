package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the context-window
  * splitter in front of every embedding/RAG indexing pipeline and the
  * long-document segmenter for pretraining (contrast
  * [[Sharding.packSequences]], which CONCATENATES short docs up to a
  * budget; chunking SPLITS long docs down to one).
  *
  * Windows start every `stride = chunkTokens − overlapTokens` tokens;
  * the final window is allowed to run short rather than re-anchoring
  * to the document tail, so chunk k always starts at token
  * `k·stride + 1` — chunk boundaries are a pure function of (doc,
  * k), stable under any corpus-level reshuffle or append.
  *
  * Scale shape: the window arithmetic happens inside one generator
  * expression per document (`transform(sequence(...))` + explode) —
  * a flat-map with zero shuffle. Output volume is len/stride windows
  * per doc (~len·C/stride tokens); downstream embedding cost, not
  * this operator, is the bottleneck at 100 TB.
  */
object Chunking {

  def chunk(df: DataFrame, text: Column, id: Column,
            chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens vs $chunkTokens")
    val stride = chunkTokens - overlapTokens
    val toks = col("__toks")
    val len = size(toks)
    // ceil((len − C) / stride) + 1 windows; short docs get exactly one
    val nChunks = when(len <= chunkTokens, lit(1))
      .otherwise(((len - chunkTokens + (stride - 1)) / stride).cast("int") + 1)
    df.select(id.as("doc_id"), split(text, " ").as("__toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          k => concat_ws(" ", slice(toks, k * stride + 1, lit(chunkTokens)))))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id"),
        size(split(col("chunk_text"), " ")).as("n_tokens"), col("chunk_text"))
  }
}
