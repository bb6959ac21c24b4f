package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running totals and token-budget shard packing — the
  * corpus-serialization step of a training-data pipeline ("pack these
  * N billion documents into ~1 GB shards in a stable global order").
  *
  * The naive expression — `sum(v) OVER (ORDER BY k)` with no
  * PARTITION BY — collapses the whole table into ONE task (Spark
  * plans an Exchange SinglePartition under the window), which is the
  * single worst scale trap in the window family: at 100 TB it is not
  * slow, it is impossible. The scale-correct form here is a two-level
  * prefix sum:
  *
  *   1. rows fold into order-aligned blocks (block id = orderKey div
  *      blockSize — deterministic arithmetic, no sampled range
  *      boundaries, so results are bit-stable across runs/cluster
  *      sizes);
  *   2. per-block subtotals (one map-side-combined groupBy, output is
  *      O(#blocks) rows) get exclusive running offsets through a
  *      single-partition window that only ever sees #blocks rows —
  *      bounded by layout choice, not by data;
  *   3. offsets broadcast-join back and a block-partitioned window
  *      (parallel, each partition ≤ blockSize rows) adds the local
  *      prefix.
  *
  * Identical answer to the global window, shuffle structure of a
  * groupBy. At 100 TB pick blockSize so a block (≈ blockSize rows)
  * fits one task comfortably; #blocks stays millions of rows at most,
  * still trivial for the offset pass.
  */
object Sharding {

  /** `df` plus `cum` = inclusive running total of `value` in
    * ascending `orderKey` order (orderKey values must be unique —
    * ties would make "running" ill-defined in any engine). */
  def globalCumsum(df: DataFrame, orderKey: String, value: Column,
                   blockSize: Long): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val withBlk = df.withColumn("__v", value.cast("long"))
      .withColumn("__blk", expr(s"CAST($orderKey AS BIGINT) div $blockSize"))
    // O(#blocks) frame: subtotal per block, then each block's EXCLUSIVE
    // offset (sum of all earlier blocks). The unpartitioned window here
    // is deliberate and safe — its input is the block-summary frame.
    val offsets = withBlk.groupBy("__blk").agg(sum(col("__v")).as("__bsum"))
      .withColumn("__offset",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__blk", "__offset")
    val local = Window.partitionBy("__blk").orderBy(orderKey)
    withBlk.join(broadcast(offsets), Seq("__blk"))
      .withColumn("cum", col("__offset") + sum(col("__v")).over(local))
      .drop("__blk", "__bsum", "__offset", "__v")
  }

  /** Per-group running totals with the same two-level structure.
    * The naive `sum(v) OVER (PARTITION BY g ORDER BY k)` collapses
    * each GROUP into one task — at low group cardinality (a corpus
    * with a dozen sources) that is the same scale trap as the global
    * form, just sliced thinner. Blocks nest inside groups here: the
    * per-group block-summary window sees O(#blocks-per-group) rows,
    * and the full table only ever flows through a (group, block)-
    * partitioned window. */
  def groupedCumsum(df: DataFrame, groupCol: String, orderKey: String,
                    value: Column, blockSize: Long): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val withBlk = df.withColumn("__v", value.cast("long"))
      .withColumn("__blk", expr(s"CAST($orderKey AS BIGINT) div $blockSize"))
    val offsets = withBlk.groupBy(groupCol, "__blk")
      .agg(sum(col("__v")).as("__bsum"))
      .withColumn("__offset",
        coalesce(sum(col("__bsum")).over(
          Window.partitionBy(groupCol).orderBy("__blk")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(groupCol), col("__blk"), col("__offset"))
    val local = Window.partitionBy(col(groupCol), col("__blk")).orderBy(orderKey)
    withBlk.join(broadcast(offsets), Seq(groupCol, "__blk"))
      .withColumn("cum", col("__offset") + sum(col("__v")).over(local))
      .drop("__blk", "__bsum", "__offset", "__v")
  }

  /** Token-budget mixture sampling ("data mixing"): keep each group's
    * stable-`orderKey` prefix while the running token total fits that
    * group's budget — the step that assembles a training corpus from
    * per-source quotas (budget is a per-row Column, normally a
    * function of the group). Whole-document granularity: a document
    * that would cross the budget is dropped, as is everything after
    * it in the group's order (prefix semantics keep the sample
    * append-stable for the same reason packShards is). */
  def mixByBudget(df: DataFrame, groupCol: String, orderKey: String,
                  tokens: Column, budget: Column, blockSize: Long): DataFrame =
    groupedCumsum(df.withColumn("n_tokens", tokens.cast("long")),
        groupCol, orderKey, col("n_tokens"), blockSize)
      .filter(col("cum") <= budget)

  /** Pack rows into contiguous shards of ~`budget` tokens in global
    * `orderKey` order: a row's shard is its STARTING offset div
    * budget, so every shard covers a half-open token range
    * [i·budget, (i+1)·budget) — rows never reorder across runs, shard
    * boundaries never move when the corpus is appended to (earlier
    * rows keep their cumsum), and a shard exceeds the budget by at
    * most one row's tokens (the standard greedy packing bound). */
  def packShards(df: DataFrame, orderKey: String, tokens: Column,
                 budget: Long, blockSize: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalCumsum(df.withColumn("n_tokens", tokens.cast("long")),
        orderKey, col("n_tokens"), blockSize)
      .withColumn("shard_id", expr(s"(cum - n_tokens) div $budget"))
  }

  /** Length-bucketed batching — the padding-waste killer for
    * fixed-shape fine-tuning/eval serving: documents are bucketed by
    * ⌈log2(len)⌉ (every batch pads to its bucket's power-of-two cap,
    * the bucketing dynamic-shape compilers want), then packed into
    * `batchSize`-document batches in stable id order within each
    * bucket. Returns one row per document: `(doc_id, n_tokens,
    * bucket, batch_id, pad_tokens)` — pad_tokens the per-doc waste
    * against the bucket cap, so Σ is the exact padding bill.
    *
    * Batch numbering rides the grouped two-level prefix sum (rank =
    * running count within the bucket), so no bucket ever collapses
    * into one task and numbering is append-stable: new documents only
    * ever extend the last batch or open new ones. */
  def lengthBucketBatches(df: DataFrame, id: Column, tokens: Column,
                          batchSize: Int, blockSize: Long): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    // bucket = smallest b with 2^b ≥ len, via integer bit-length —
    // float log2 rounds ambiguously at exact powers of two
    val base = df.select(id.as("doc_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("bucket", when(col("n_tokens") <= 1L, 0L)
        .otherwise(length(bin(col("n_tokens") - 1L)).cast("long")))
    groupedCumsum(base, "bucket", "doc_id", lit(1L), blockSize)
      .withColumn("batch_id", expr(s"(cum - 1) div $batchSize"))
      .withColumn("pad_tokens",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
          - col("n_tokens"))
      .select("doc_id", "n_tokens", "bucket", "batch_id", "pad_tokens")
  }

  /** Temperature-scaled mixture sampling (the multilingual-corpus
    * rebalancing of XLM-R / mT5: sample source s with probability
    * ∝ c_s^α, α < 1 flattening the source distribution so head
    * sources stop drowning the tail). Given per-group token counts
    * c_s and a corpus token budget B, each group's target is
    * B·c_s^α / Σc^α and its keep-rate r_s = min(1, target / c_s) —
    * pinned to parts-per-million and applied as a DETERMINISTIC
    * content-hash threshold per row (md5(id) mod 1e6 < r_s·1e6), so
    * the sample is reproducible across runs, engines, and cluster
    * sizes, and a document's membership never depends on scan order.
    *
    * Returns the kept rows with their group's `(c_tokens, rate_ppm)`
    * attached. Scale shape: one map-side-combined groupBy for the
    * totals (O(#groups) rows), the rate frame broadcast back, one
    * filter — no shuffle of the corpus at all. */
  def mixByTemperature(df: DataFrame, groupCol: String, id: Column,
                       tokens: Column, alpha: Double,
                       budgetTokens: Long): DataFrame = {
    require(alpha > 0 && budgetTokens > 0, "alpha/budget must be positive")
    val t = df.withColumn("__n", tokens.cast("long"))
    val totals = t.groupBy(groupCol).agg(sum(col("__n")).as("c_tokens"))
    val z = totals.agg(sum(pow(col("c_tokens"), alpha)).as("__z"))
    val rates = totals.crossJoin(broadcast(z))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          round(lit(budgetTokens.toDouble) * pow(col("c_tokens"), alpha)
            / col("__z") / col("c_tokens") * 1e6).cast("long")))
      .select(col(groupCol), col("c_tokens"), col("rate_ppm"))
    t.join(broadcast(rates), Seq(groupCol))
      .filter(graft.functions.VectorFunctions.tokenHash(id.cast("string"))
        % 1000000L < col("rate_ppm"))
      .drop("__n")
  }

  /** Fixed-length sequence packing — the final tensor-shaping step of
    * a pretraining pipeline: documents are laid end-to-end in global
    * `orderKey` order, each followed by ONE end-of-sequence token, and
    * the token stream is cut every `seqLen` tokens into training rows
    * of EXACTLY that length (the last may run short). Unlike
    * `packShards` (whole documents, variable shard size) a document
    * here SPLITS across sequence boundaries — the GPT-style packing
    * where no pad tokens exist and attention masks are rebuilt from
    * the document spans this emits.
    *
    * Returns the doc→sequence span map, one row per (document,
    * sequence) incidence: `(doc_id, seq_id, seq_off, n_tokens)` —
    * exactly what a shard writer needs to route each document's token
    * slice into its sequence rows, and what the mask builder needs to
    * mark document boundaries. Span rows number ≈ total_tokens/seqLen
    * + n_docs (each doc adds its floor-crossings plus one) — linear,
    * never materializing per-token rows. Offsets come from the same
    * two-level prefix sum as `packShards`, so no global window ever
    * collapses to one task and boundaries are append-stable: packing
    * more documents onto the end never moves an existing span. */
  def packFixedSequences(df: DataFrame, orderKey: String, tokens: Column,
                         seqLen: Int, blockSize: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // project to (key, count) BEFORE the cumsum: the span map needs
    // nothing else, and the block-window sort should move 16-byte
    // rows, not document payloads
    globalCumsum(df.select(col(orderKey), (tokens.cast("long") + 1L).as("__n")),
        orderKey, col("__n"), blockSize)
      .withColumn("__start", col("cum") - col("__n"))
      .withColumn("seq_id",
        explode(sequence(expr(s"__start div $seqLen"),
          expr(s"(cum - 1) div $seqLen"))))
      .select(col(orderKey).as("doc_id"), col("seq_id"),
        greatest(col("__start") - col("seq_id") * seqLen, lit(0L))
          .as("seq_off"),
        (least(col("cum"), (col("seq_id") + 1) * seqLen)
          - greatest(col("__start"), col("seq_id") * seqLen)).as("n_tokens"))
  }

  /** Deterministic multi-epoch training shuffle: every epoch gets its
    * own content-keyed permutation of the corpus (shuffle key =
    * md5(id:epoch), so order is reproducible across runs and engines,
    * never RNG state), each row's epoch position assigned by the
    * two-level prefix sum — the naive row_number() over a global
    * ORDER BY hash is the same single-task collapse packShards
    * avoids. Rows round-robin over `numShards` output shards, so
    * shard sizes differ by at most one and a 1000-executor write
    * fans out evenly.
    *
    * The position key packs (hash28 << 32 | id) into one BIGINT
    * (28 hash bits — 7 md5 hex digits — keep the product inside
    * signed-64): primary order is the per-epoch hash, ties (28-bit
    * collisions, certain at corpus scale) break by id, keeping
    * positions unique and the permutation total. Requires ids unique
    * and < 2^32. Unlike packShards the key space here is the sparse
    * hash range, not dense row offsets, so the prefix-sum block width
    * is derived from the keyspace: hash uniformity makes the
    * `blocksPerEpoch` blocks roughly equal row count. */
  def epochShuffle(df: DataFrame, id: Column, epochs: Int, numShards: Int,
                   blocksPerEpoch: Int = 1 << 10): DataFrame = {
    require(epochs > 0 && numShards > 0 && blocksPerEpoch > 0,
      "epochs/numShards/blocksPerEpoch must be positive")
    val keyBlock = math.max((1L << 60) / blocksPerEpoch, 1L)
    val keyed = df.select(id.cast("long").as("doc_id"))
      .withColumn("epoch", explode(array((0 until epochs).map(lit(_)): _*)))
      .withColumn("skey",
        conv(substring(md5(concat(col("doc_id"), lit(":"), col("epoch"))), 1, 7),
          16, 10).cast("long") * lit(4294967296L) + col("doc_id"))
    groupedCumsum(keyed, "epoch", "skey", lit(1L), keyBlock)
      .withColumn("pos", col("cum"))
      .withColumn("shard", ((col("pos") - 1) % numShards).cast("long"))
      .select("doc_id", "epoch", "pos", "shard")
  }

  /** Curriculum staging (the length/difficulty curriculum: train on
    * easy documents first): every document's GLOBAL difficulty rank
    * and its ntile-style stage of `nStages`. The textbook form —
    * `ntile(n) OVER (ORDER BY difficulty)` — is an unpartitioned
    * window, the same Exchange SinglePartition collapse globalCumsum
    * exists to avoid; here the rank IS a prefix count through the
    * two-level sum. The rank key packs the integer difficulty above
    * `idBits` id bits, so ties break by id and the block arithmetic
    * stays pure-integer: difficulty must fit 62 − idBits bits, ids
    * idBits bits. Stage boundaries are the exact ntile ones
    * (⌊(rank−1)·nStages/N⌋); N rides as an in-plan 1-row broadcast,
    * never a driver round-trip. */
  def curriculumStages(df: DataFrame, id: Column, difficulty: Column,
                       nStages: Int, idBits: Int = 33,
                       blockSize: Long = 1L << 30): DataFrame = {
    require(nStages > 0, "nStages must be positive")
    require(idBits > 0 && idBits < 62, s"idBits out of range: $idBits")
    val keyed = df.select(id.cast("long").as("doc_id"),
        difficulty.cast("long").as("difficulty"))
      .withColumn("__key",
        shiftleft(col("difficulty"), idBits) + col("doc_id"))
    val total = keyed.agg(count(lit(1)).as("__n"))
    globalCumsum(keyed, "__key", lit(1L), blockSize)
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("difficulty"), col("cum").as("rank"),
        // integer `div`, not `/`: Spark's / on longs is double division
        expr(s"CAST(((cum - 1) * $nStages) div __n AS BIGINT)").as("stage"))
  }
}
