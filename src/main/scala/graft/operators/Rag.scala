package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.tokenHash

/** Retrieval plumbing: the chunk → embed → index → probe composition
  * a RAG corpus build runs over every document store.
  *
  * The embedding is signed feature hashing (Weinberger et al. 2009)
  * of whitespace tokens into `Similarity.lshDims` float dims — bucket
  * and sign both derive from the portable md5 token hash, so the
  * whole composition (chunking included) replays exactly in the
  * DuckDB oracle. In production the embed stage is where a model
  * endpoint slots in (same (id, text) → (id, array<float>) shape);
  * everything downstream — the sign-LSH index layout, the bucketed
  * probe, the exact rerank — is embedding-agnostic and already the
  * serving posture the persisted-ANN family asserts.
  *
  * Scale shape: embedding is one token explode + a map-side-combined
  * 64-column sum keyed on the chunk (the corpus's only exchange);
  * the index is Similarity.annIndexFrame (pure per-row math, persist
  * bucketed on `bucket`); probes pay |queries| hyperplane dots.
  */
object Rag {

  /** Chunk keys pack (doc, chunk) into one BIGINT: doc_id ·
    * chunkKeyBase + chunk_id. 2^20 chunks/doc headroom keeps the key
    * unique for any realistic document at 64-token chunks. */
  val chunkKeyBase: Long = 1L << 20

  /** Signed feature-hash embedding: dim = h mod dims, sign = bit 6 of
    * the same hash (disjoint from the dim bits for dims ≤ 64 ... the
    * sign bit rides ABOVE the bucket bits). Integer counts are
    * float-exact, so the cast loses nothing. */
  def hashEmbed(df: DataFrame, text: Column, id: Column,
                dims: Int = Similarity.lshDims): DataFrame = {
    val tok = df.select(id.as("vec_id"), explode(split(text, " ")).as("token"))
      .withColumn("h", tokenHash(col("token")))
      .withColumn("d", pmod(col("h"), lit(dims.toLong)))
      .withColumn("sgn",
        when(pmod(shiftright(col("h"), 6), lit(2L)) === 0, lit(1.0)).otherwise(lit(-1.0)))
    val sums = (0 until dims).map(j =>
      sum(when(col("d") === j, col("sgn")).otherwise(0.0)).as(s"e$j"))
    tok.groupBy("vec_id").agg(sums.head, sums.tail: _*)
      .select(col("vec_id"),
        array((0 until dims).map(j => col(s"e$j").cast("float")): _*).as("embedding"))
  }

  /** Chunk embeddings keyed by the packed chunk id — the frame both
    * the LSH index and the exact-recall baseline consume. */
  def chunkEmbeddings(docs: DataFrame, text: Column, id: Column,
                      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    val ch = Chunking.chunk(docs, text, id, chunkTokens, overlapTokens)
      .select((col("doc_id") * chunkKeyBase + col("chunk_id")).as("vec_id"),
        col("chunk_text"))
    hashEmbed(ch, col("chunk_text"), col("vec_id"))
  }

  /** The retrieval index: overlapping chunks, embedded and laid out
    * as the sign-LSH serving frame (persist bucketed on `bucket` via
    * Bucketing.writeBucketed — same contract as annIndexFrame). */
  def chunkIndex(docs: DataFrame, text: Column, id: Column,
                 chunkTokens: Int, overlapTokens: Int): DataFrame =
    Similarity.annIndexFrame(
      chunkEmbeddings(docs, text, id, chunkTokens, overlapTokens))

  /** Retrieve top-k chunks per query text; neighbor keys decode back
    * to (src_doc, chunk_id). Queries wear negative ids so they can
    * never collide with a chunk key. */
  def retrieve(index: DataFrame, queries: DataFrame, text: Column, id: Column,
               k: Int): DataFrame = {
    val q = hashEmbed(queries.select((-(id + 1)).as("qid"), text.as("qtext")),
      col("qtext"), col("qid"))
    Similarity.lshAnnProbe(index, q, k)
      .select((-col("query_id") - 1).as("query_doc"),
        floor(col("neighbor_id") / chunkKeyBase).cast("long").as("src_doc"),
        pmod(col("neighbor_id"), lit(chunkKeyBase)).as("chunk_id"),
        col("cos"), col("rk").cast("long").as("rk"))
  }
}
