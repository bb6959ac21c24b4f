package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{fastCosine, fastDot, fastNormSq}
import graft.plans.GraftFunctions

/** Approximate-nearest-neighbor search over an `array<float>`
  * embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query
  * set against the corpus; one scan, no corpus shuffle, then a
  * per-query top-k window. Exact, and the right answer whenever
  * |queries| ≪ |corpus|.
  *
  * Scale path: random-hyperplane LSH — 16 sign bits per vector form
  * a bucket key; queries probe only their own bucket (multi-probe =
  * flipping bits, not implemented here). The corpus side is a single
  * projection + exchange on the bucket key; at 100 TB the bucket
  * partitioning IS the index.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (cosine, ties broken
    * by vec_id for determinism). Norms are precomputed per side, so
    * each of the |Q|·|C| pairs costs one dot product. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
    val q = queries.withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
    val scored = q.as("q")
      .join(c.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos", round(
        fastDot(col("q.embedding"), col("c.embedding"))
          / (col("q.nrm") * col("c.nrm")), 6))
    val w = Window.partitionBy(col("q.vec_id"))
      .orderBy(col("cos").desc, col("c.vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("cos"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight =
    * a fixed integer hash mapped to [-1, 1). Reproducible across
    * engines and runs — no RNG state; exposed (package-wide) so the
    * DuckDB oracle SQL can embed the identical weights as literals. */
  private[graft] def planeWeight(p: Int, d: Int): Double = {
    val h = (p * 1000003L + d * 7919L + 12345L) * 2654435761L % 1000000007L
    (math.abs(h).toDouble / 1000000007.0) * 2.0 - 1.0
  }

  /** Corpus embedding dimensionality (embeddings.parquet). */
  val lshDims = 64
  val lshPlanes = 16

  /** 16-bit random-hyperplane signature as a bucket key: 16 native
    * dot products against literal plane vectors (one tight codegen
    * loop each — not a 16×64-term expression tree). */
  def lshBucket(emb: DataFrame, nPlanes: Int = lshPlanes): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    val dims = lshDims
    val bucket = (0 until nPlanes).map { p =>
      val plane = lit((0 until dims).map(d => planeWeight(p, d).toFloat).toArray)
      when(fastDot(col("embedding"), plane) >= 0, lit(1L) * (1L << p)).otherwise(0L)
    }.reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /** ANN via LSH buckets: exact rerank inside each bucket. Recall is
    * approximate by construction; candidates never leave their
    * bucket partition. */
  def lshAnn(emb: DataFrame, k: Int, nPlanes: Int = 16): DataFrame =
    lshAnnFor(emb, emb, k, nPlanes)

  /** Bucketed + normed projection every LSH entry point shares: one
    * pass computing the nPlanes sign bits and the vector norm. */
  private def bucketedNormed(df: DataFrame, nPlanes: Int): DataFrame =
    lshBucket(df, nPlanes).select("vec_id", "embedding", "bucket")
      .withColumn("nrm", sqrt(fastNormSq(col("embedding"))))

  /** XOR masks for every probe bucket within Hamming `radius` of the
    * home bucket: mask 0 (home) first, then all weight-1 flips, then
    * weight-2, … — a deterministic enumeration the DuckDB oracle
    * reproduces literally (DataOps embeds this list). Distinct masks
    * yield pairwise-distinct probe values, so a corpus vector's single
    * bucket matches at most one probe and candidates never need
    * deduplication. Probe count grows as C(nPlanes, ≤radius); radius
    * is the standard recall-vs-cost knob. */
  private[graft] def probeMasks(nPlanes: Int, radius: Int): Seq[Long] =
    (0 to radius).flatMap(w =>
      (0 until nPlanes).combinations(w).map(_.map(b => 1L << b).sum).toSeq)

  private def withProbes(bucketed: DataFrame, masks: Seq[Long]): DataFrame =
    bucketed.withColumn("probe",
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))

  /** Shared candidate-join + exact-cosine rerank: probes carry a
    * `probe` bucket key; corpus rows stay in their single bucket. */
  private def rerankByBucket(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = probes.as("q")
      .join(corpus.as("c"), col("q.probe") === col("c.bucket")
        && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos", round(
        fastDot(col("q.embedding"), col("c.embedding"))
          / (col("q.nrm") * col("c.nrm")), 6))
    val w = Window.partitionBy(col("q.vec_id"))
      .orderBy(col("cos").desc, col("c.vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        col("cos"), col("rk"))
  }

  /** Same index, explicit query set: when |queries| ≪ |corpus| the
    * bucket signatures, join and per-query rerank window are computed
    * only for the probing vectors — never pay the all-pairs self-join
    * to answer a handful of lookups. */
  def lshAnnFor(corpus: DataFrame, queries: DataFrame, k: Int,
                nPlanes: Int = 16): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val b = bucketedNormed(corpus, nPlanes)
    val qb = bucketedNormed(queries, nPlanes).withColumn("probe", col("bucket"))
    rerankByBucket(qb, b, k)
  }

  /** The serving-index frame — (vec_id, embedding, bucket, nrm), the
    * one pass of hyperplane math a corpus pays at index-build time.
    * Persist it as a parquet table bucketed on `bucket`
    * (Bucketing.writeBucketed) and every probe reads the corpus side
    * co-partitioned on the join key with ZERO per-query index work:
    * no hyperplane dots, no norm pass, no exchange. That is the ANN
    * serving posture at 100 TB — the index is storage layout, not a
    * per-query subtree (asserted in AnnIndexSpec). */
  def annIndexFrame(corpus: DataFrame, nPlanes: Int = lshPlanes): DataFrame =
    bucketedNormed(corpus, nPlanes)

  /** Cross-corpus mutual-best-match mining (Artetxe & Schwenk 2019's
    * bidirectional criterion, the bitext-mining / dataset-linking
    * alignment primitive): a pair (a, b) survives only when b is a's
    * best exact-cosine candidate AND a is b's — the filter that kills
    * hub vectors which are "someone's nearest neighbor" thousands of
    * times over.
    *
    * Shape: BOTH sides are full corpora, so candidates are blocked by
    * the shared sign-LSH bucket — one bucket-keyed equi-join (each
    * side shuffles once on `bucket`, candidate volume Σ_b |A_b|·|B_b|,
    * never |A|·|B|), then the SAME candidate frame is ranked in both
    * directions by two keyed windows; a row where both row_numbers
    * are 1 is mutual. No second join, no second hyperplane pass. */
  /** The shared cross-corpus candidate frame: bucket-blocked pairs
    * with exact 6dp cosine — the one expensive join both alignment
    * verdicts (mutual, margin) rank.
    *
    * `maxBucket` (0 = off) is the HOT-BUCKET guard, the same
    * discipline as semDedup's maxCell: Σ_b |A_b|·|B_b| is only a
    * bound while no bucket balloons, and one viral/near-copy cluster
    * concentrated in a single bucket turns the blocked join quadratic
    * (measured: the 100× rehearsal's 134-s straggler). With
    * maxBucket > 0, every bucket whose LARGER side exceeds the cap is
    * deterministically sub-split into ceil(max(|A_b|,|B_b|)/maxBucket)
    * slices and only same-slice pairs are compared — candidates can
    * only be LOST, never invented (MutualCapSpec), so semantically
    * this is "more, finer buckets": a pair whose true best mate lands
    * in another slice is ranked within what remains, the standard
    * blocking-refinement recall trade. The slice is the residue of
    * the md5 ID HASH, not of the raw id — cross-corpus sides are
    * routinely id-striped (this engine's own even/odd convention),
    * and a raw-id residue with an even nsub would annihilate every
    * cross-parity pair in the bucket instead of thinning it
    * uniformly. The sub-split needs one per-bucket count aggregate
    * per side, joined back on the bucket key. */
  private def crossScored(a: DataFrame, b: DataFrame, nPlanes: Int,
                          maxBucket: Int): DataFrame = {
    GraftFunctions.ensureRegistered(a.sparkSession)
    val ab = bucketedNormed(a, nPlanes)
    val bb = bucketedNormed(b, nPlanes)
    val (aj, bj) =
      if (maxBucket <= 0) (ab, bb)
      else {
        val nsub = ab.groupBy("bucket").agg(count(lit(1)).as("na"))
          .join(bb.groupBy("bucket").agg(count(lit(1)).as("nb")),
            Seq("bucket"), "full_outer")
          .select(col("bucket"),
            ceil(greatest(coalesce(col("na"), lit(0L)), coalesce(col("nb"), lit(0L)))
              / maxBucket.toDouble).cast("long").as("nsub"))
        def sliced(df: DataFrame) = df.join(nsub, Seq("bucket"))
          .withColumn("slice", pmod(
            graft.functions.VectorFunctions.tokenHash(col("vec_id").cast("string")),
            col("nsub")))
        (sliced(ab), sliced(bb))
      }
    val joinCond =
      if (maxBucket <= 0) col("a.bucket") === col("b.bucket")
      else col("a.bucket") === col("b.bucket") && col("a.slice") === col("b.slice")
    aj.as("a").join(bj.as("b"), joinCond)
      .withColumn("cos", round(
        fastDot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), col("cos"))
  }

  def mutualMatches(a: DataFrame, b: DataFrame,
                    nPlanes: Int = lshPlanes, maxBucket: Int = 0): DataFrame = {
    val scored = crossScored(a, b, nPlanes, maxBucket)
    val fw = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
    val bw = Window.partitionBy("b_id").orderBy(col("cos").desc, col("a_id"))
    scored.withColumn("fr", row_number().over(fw))
      .withColumn("br", row_number().over(bw))
      .filter(col("fr") === 1 && col("br") === 1)
      .select(col("a_id"), col("b_id"), col("cos"))
  }

  /** Margin-scored alignment (Artetxe & Schwenk 2019 §3, the "ratio"
    * margin): each a-side vector proposes its best candidate, scored
    * by cos(a,b) divided by the mean of both sides' top-k candidate
    * cosines — the absolute-threshold killer, because a hub with
    * uniformly high cosines has a high denominator and a genuine
    * translation pair a low one. Pairs below `minMarginMicro`
    * (micro-units; the paper's typical cut is ~1.05 → 1_050_000)
    * are dropped.
    *
    * Determinism: cosines are 6dp, so their micro form is exact
    * integers; both k-NN sums are integer sums, and the final ratio
    * divides exact integers well under 2⁵³ — both engines IEEE-divide
    * the same values and round to the same micro integer.
    *
    * Shape: the SAME bucket-blocked candidate frame as
    * mutualMatches, ranked by two keyed windows in one pass, then
    * PRUNED to rn_a ≤ k ∨ rn_b ≤ k before staging (GraftBridge
    * .stageLocal, the constraint-free checkpoint): the three
    * consumers — both per-side top-k aggregates and the forward-best
    * verdict — only ever read top-k rows, so the staged frame is
    * O((|A|+|B|)·k), not O(candidates). Staging the raw candidate
    * frame materialized Σ_b |A_b|·|B_b| rows and filled the local
    * disk at the 1000× rehearsal. */
  def marginMatches(a: DataFrame, b: DataFrame, k: Int,
                    nPlanes: Int = lshPlanes,
                    minMarginMicro: Long = 1050000L,
                    maxBucket: Int = 0): DataFrame = {
    val scored = crossScored(a, b, nPlanes, maxBucket)
      .withColumn("cu", round(col("cos") * 1e6).cast("long"))
    val fw = Window.partitionBy("a_id").orderBy(col("cu").desc, col("b_id"))
    val bw = Window.partitionBy("b_id").orderBy(col("cu").desc, col("a_id"))
    // Stage AFTER ranking and top-k pruning, not before: the staged
    // frame is what three consumers reuse (both per-side top-k
    // aggregates + the forward-best verdict), and everything they need
    // satisfies rn_a ≤ k ∨ rn_b ≤ k — O((|A|+|B|)·k) rows. Staging the
    // RAW candidate frame materialized Σ_b |A_b|·|B_b| rows to local
    // disk and filled it at the 1000× rehearsal (no-space-left); the
    // two ranking windows run once either way, inside this one plan.
    val ranked = org.apache.spark.sql.GraftBridge.stageLocal(
      scored.withColumn("rn_a", row_number().over(fw))
        .withColumn("rn_b", row_number().over(bw))
        .filter(col("rn_a") <= k || col("rn_b") <= k))
    val na = ranked.filter(col("rn_a") <= k).groupBy("a_id")
      .agg(sum(col("cu")).as("sum_a"), count(lit(1)).as("n_a"))
    val nb = ranked.filter(col("rn_b") <= k).groupBy("b_id")
      .agg(sum(col("cu")).as("sum_b"), count(lit(1)).as("n_b"))
    ranked.filter(col("rn_a") === 1)
      .join(na, "a_id").join(nb, "b_id")
      .filter(col("sum_a") * col("n_b") + col("sum_b") * col("n_a") > 0)
      .withColumn("margin_micro",
        round(lit(1e6) * col("cu") * 2 * col("n_a") * col("n_b")
          / (col("sum_a") * col("n_b") + col("sum_b") * col("n_a")))
          .cast("long"))
      .filter(col("margin_micro") >= minMarginMicro)
      .select(col("a_id"), col("b_id"), col("cos"), col("margin_micro"))
  }

  /** Probe a stored index frame: only the query side computes its
    * sign bits; the index is consumed as-is. Same answer as
    * lshAnnFor(corpus, queries, k) over the corpus the index was
    * built from. */
  def lshAnnProbe(index: DataFrame, queries: DataFrame, k: Int,
                  nPlanes: Int = lshPlanes): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val qb = bucketedNormed(queries, nPlanes).withColumn("probe", col("bucket"))
    rerankByBucket(qb, index, k)
  }

  /** Multi-probe LSH ANN: the query side also probes every bucket
    * within Hamming distance `probeRadius` (default 1: flip each of
    * the nPlanes sign bits), trading more candidate lookups for
    * substantially higher recall — the standard knob when single-probe
    * buckets are too precise. Candidates stay bucket-partitioned; only
    * the probe list grows. The self-join builds the bucketed+normed
    * projection ONCE and derives the probe side from it — both join
    * inputs share the subtree, so the 16 hyperplane dot products per
    * vector are paid once, not twice (the r5 delegation to the
    * two-sided form doubled them; BENCH r5 showed 1.77s → 3.56s). */
  def lshAnnMultiProbe(emb: DataFrame, k: Int, nPlanes: Int = 16,
                       probeRadius: Int = 1): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    val b = bucketedNormed(emb, nPlanes)
    rerankByBucket(withProbes(b, probeMasks(nPlanes, probeRadius)), b, k)
  }

  /** Multi-probe with an explicit query set — the same asymmetry as
    * lshAnnFor: only the probing vectors explode into their probe
    * lists, so answering |Q| lookups costs |Q|·C(nPlanes, ≤radius)
    * bucket probes instead of |corpus|·C(nPlanes, ≤radius). The
    * corpus side stays a single bucket-keyed projection. Passing the
    * corpus itself as the query frame falls back to the shared-subtree
    * self-join form above. */
  def lshAnnMultiProbeFor(corpus: DataFrame, queries: DataFrame, k: Int,
                          nPlanes: Int = 16, probeRadius: Int = 1): DataFrame =
    if (corpus eq queries) lshAnnMultiProbe(corpus, k, nPlanes, probeRadius)
    else {
      GraftFunctions.ensureRegistered(corpus.sparkSession)
      val b = bucketedNormed(corpus, nPlanes)
      val probes = withProbes(bucketedNormed(queries, nPlanes),
        probeMasks(nPlanes, probeRadius))
      rerankByBucket(probes, b, k)
    }

  /** Plane-index offset separating the random-projection matrix from
    * the LSH hyperplane set (same deterministic planeWeight stream). */
  val rpSeedOffset = 1000

  /** Johnson–Lindenstrauss random projection: compress embeddings to
    * `outDims` via a fixed pseudo-random matrix (planeWeight rows,
    * scaled 1/√outDims so expected norms are preserved). The standard
    * pre-ANN compression at corpus scale — a 4× narrower vector means
    * 4× less shuffle and cache for every downstream join — with the
    * JL guarantee that pairwise geometry survives in expectation.
    * Deterministic closed form + 6dp rounding → the DuckDB oracle
    * replays the projection exactly (same trick as the LSH planes).
    * One codegen'd dot per output dim; no shuffle at all. */
  def randomProject(emb: DataFrame, outDims: Int = 16): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    emb.select(col("vec_id"), rpColumn(outDims).as("rp"))
  }

  /** The projection array as a Column (shared by randomProject and the
    * projected-space ANN below, so both index the identical rounded
    * coordinates). */
  private def rpColumn(outDims: Int): org.apache.spark.sql.Column = {
    val scale = 1.0 / math.sqrt(outDims)
    array((0 until outDims).map { p =>
      val plane = lit((0 until lshDims).map(d =>
        planeWeight(rpSeedOffset + p, d).toFloat).toArray)
      round(fastDot(col("embedding"), plane) * scale, 6)
    }: _*)
  }

  /** Bucketed + normed projection for the RP-ANN entry points: a JL
    * coordinate IS a hyperplane dot product, so the outDims sign bits
    * of the projection form a sign-LSH bucket key with zero extra
    * arithmetic — the compress→index composition the JL operator
    * exists for. Rerank stays FULL-dimension (exact cosine on the
    * original vectors); only candidate generation lives in the
    * compressed space, which is the posture that scales: the 4×
    * narrower vectors are what a 100 TB corpus shuffles and caches
    * for indexing, while the expensive exact math runs only on the
    * bucket-sized candidate sets. */
  private def rpBucketedNormed(df: DataFrame, outDims: Int): DataFrame = {
    val sign = (0 until outDims).map { i =>
      when(element_at(col("rp"), i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col("vec_id"), col("embedding"), rpColumn(outDims).as("rp"))
      .select(col("vec_id"), col("embedding"), sign.as("bucket"))
      .withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
  }

  /** ANN through the JL-projected index with an explicit query set:
    * same query-bound asymmetry as lshAnnFor — only the probing
    * vectors compute projections outside the corpus-side index
    * build, and answering |Q| lookups costs |Q| bucket probes. */
  def rpAnnFor(corpus: DataFrame, queries: DataFrame, k: Int,
               outDims: Int = 16): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val b = rpBucketedNormed(corpus, outDims)
    val qb = rpBucketedNormed(queries, outDims).withColumn("probe", col("bucket"))
    rerankByBucket(qb, b, k)
  }

  /** IVF-style coarse index: assign each vector to its nearest of
    * `centroids` (a tiny broadcast table of (centroid_id, embedding));
    * queries search only their own cell. Centroids would come from a
    * sampled k-means at scale; any deterministic seed set works. */
  /** Train IVF centroids with MLlib k-means (seeded → deterministic).
    * At scale this runs on a sample — centroid quality needs only a
    * sketch of the distribution, not the full corpus. Returns the
    * same (centroid_id, embedding) shape ivfAssign consumes. */
  def trainCentroids(emb: DataFrame, k: Int, seed: Long = 42L,
                     maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val feats = emb.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).fit(feats)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i.toLong, v.toArray.map(_.toFloat)) }
      .toDF("centroid_id", "embedding")
  }

  /** Oracle-replayable Lloyd training. Deterministic by construction:
    * init = the k lowest-vec_id vectors, cosine distance rounded to
    * 6dp (ties → lower centroid_id), per-dimension means rounded to
    * 6dp. The rounding pins every iteration to values both engines
    * reproduce despite different float summation orders — the same
    * cross-engine parity trick as the pinned LSH planes above.
    * Centroid state (k × dims doubles) lives on the driver between
    * passes — the model-state shape MLlib itself keeps — so each
    * iteration is exactly one broadcast assignment pass over the
    * corpus plus a k×dims-row mean. At 100 TB: train on a sample,
    * assign on the full corpus (same posture as trainCentroids). */
  /** Session-level training memo: lloydTrain is a PURE function of
    * its input (closed-form init, 6dp-pinned iterations), so an
    * identical (canonical input plan, k, iters) triple always yields
    * the same centroids — queries sharing a training corpus (the IVF
    * family: cell-size summary, IVF-blocked dedup, incremental
    * embedding dedup) pay the driver-driven Lloyd loop once per JVM
    * instead of once per query. Keying on the CANONICALIZED analyzed
    * plan (not a caller-supplied tag) makes a wrong-key hit
    * impossible: different sources, filters, or scale dirs canonicalize
    * differently.
    *
    * Two key regimes, both bounded by a 32-entry LRU (an unbounded
    * plan-object map pins every in-memory training corpus in the
    * driver for the JVM's lifetime):
    *  - ALL-FILE-BACKED lineage → a string key rendering the
    *    canonical tree plus each file relation's (sorted root paths,
    *    data schema, content fingerprint of per-file length+mtime).
    *    Plan-object keys would make file reads memo-blind: a fresh
    *    `spark.read` builds a fresh FileIndex, which compares by
    *    reference, so two reads of the same path never canonicalize
    *    equal. The fingerprint closes the converse hazard: an
    *    in-place OVERWRITE of a memoized path within one JVM (what
    *    mode=overwrite writes) must miss, not serve stale centroids
    *    (LloydMemoSpec proves both directions).
    *  - anything else (LocalRelation fixtures, RDD-backed frames) →
    *    the canonicalized plan OBJECT (structural case-class
    *    equality, row data included). Never its toString —
    *    LocalRelation.toString elides rows, so two in-memory frames
    *    with the same schema would string-collide and hand one corpus
    *    the other's centroids (caught by IndexLifecycleSpec's retrain
    *    test). */
  private val lloydMemoMax = 32
  private val lloydMemo =
    new java.util.LinkedHashMap[AnyRef, Seq[(Long, Seq[Double])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, Seq[(Long, Seq[Double])]]): Boolean =
        size() > lloydMemoMax
    }

  private def lloydMemoKey(metric: String, emb: DataFrame,
                           k: Int, iters: Int): AnyRef = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val c = emb.queryExecution.analyzed.canonicalized
    val fileKeys = c.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => Some {
          // content fingerprint: (path, length, mtime) of every file
          // behind the relation — an in-place overwrite of the same
          // root path (mode=overwrite, the gen ping-pong) changes the
          // file set and misses the memo instead of serving the OLD
          // corpus's centroids. The FileIndex caches this listing at
          // read time, so the fold is driver-local and list-free.
          val fp = h.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
            .sorted.mkString(",").hashCode
          val roots = h.location.rootPaths.map(_.toString).sorted.mkString(",")
          s"$roots|${h.dataSchema.catalogString}|fp=$fp:${h.location.sizeInBytes}"
        }
        case _ => None
      }
      case _ => None
    }
    if (fileKeys.nonEmpty && fileKeys.forall(_.isDefined))
      (s"$metric-files", c.treeString + fileKeys.flatten.mkString(";"), k, iters)
    else (s"$metric-plan", c, k, iters)
  }

  private def lloydMemoized(metric: String, emb: DataFrame, k: Int, iters: Int)
                           (train: => Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    val key = lloydMemoKey(metric, emb, k, iters)
    lloydMemo.synchronized(Option(lloydMemo.get(key))).getOrElse {
      // train OUTSIDE the lock (it drives Spark jobs); a concurrent
      // duplicate train is benign — pure function, identical result
      val r = train
      lloydMemo.synchronized(lloydMemo.put(key, r))
      r
    }
  }

  def lloydTrain(emb: DataFrame, k: Int, iters: Int = 4): Seq[(Long, Seq[Double])] =
    lloydMemoized("cos", emb, k, iters)(lloydTrainImpl(emb, k, iters))

  /** Deterministic hash slice of a vector corpus: vectors whose
    * md5-id hash lands in residue 0 of `mod` — a ~1/mod sample that
    * is reproducible across engines (the DuckDB oracle replays the
    * identical predicate), independent of id assignment order
    * (contrast `vec_id % mod`, which aliases any id-striping), and
    * O(scan) to take. Choosing mod ∝ corpus size makes the slice a
    * FIXED-SIZE sample — the quantizer-training posture at scale. */
  def hashSample(emb: DataFrame, mod: Long): DataFrame =
    if (mod <= 1) emb
    else emb.filter(
      pmod(graft.functions.VectorFunctions.tokenHash(col("vec_id").cast("string")),
        lit(mod)) === 0)

  /** Sample-trained Lloyd quantizer — the spill-decade posture
    * BASELINE.md's 1000× probe forced: training cost is k·N·iters, so
    * neither k nor the training N may scale with the corpus (the
    * k∝corpus run burned an hour of broadcast-argmin work and OOM'd
    * in the mean reduction). Centroid quality needs only a sketch of
    * the distribution: train on the fixed-size [[hashSample]] slice
    * with a bounded k, then assign the full corpus — cells that still
    * balloon are the PAIR stage's problem, which semDedup's maxCell
    * sub-split already bounds (finer blocks, same verdict algebra).
    * Same 6dp-pinned loop, so the sampled form replays in the oracle
    * exactly like the full one. */
  def lloydTrainSampled(emb: DataFrame, k: Int, iters: Int,
                        sampleMod: Long): Seq[(Long, Seq[Double])] =
    lloydTrain(hashSample(emb, sampleMod), k, iters)

  private def lloydTrainImpl(emb: DataFrame, k: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    // The loop drives iters+1 jobs over the same vectors; pin them in
    // memory for the duration instead of re-scanning the source (and
    // re-deriving the projection) every assignment pass.
    val src = emb.select("vec_id", "embedding").persist()
    try {
      var cents: Seq[(Long, Seq[Double])] =
        src.orderBy("vec_id").limit(k).collect()
          .zipWithIndex.map { case (r, i) =>
            (i.toLong, r.getSeq[Float](1).map(_.toDouble)) }.toSeq
      (1 to iters).foreach { _ =>
        val assigned = lloydAssign(src, cents.toDF("centroid_id", "cent"))
        val means = assigned
          .select(col("centroid_id"), posexplode(col("embedding")))
          .groupBy(col("centroid_id"), col("pos"))
          // order-independent mean: per-value integer micros, an exact
          // integer sum, one rounded division — round(avg(), 6) sits at
          // a grid boundary whenever the true mean does, and parallel
          // summation order then flips the 6th decimal run-to-run
          .agg((round(sum(round(col("col").cast("double") * 1e6).cast("long"))
              / count(lit(1))).cast("long") / 1e6).as("v"))
          .collect()
        val byCid = means.groupBy(_.getLong(0)).map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        // a cluster that lost all members keeps its previous centroid
        cents = cents.map { case (cid, old) => (cid, byCid.getOrElse(cid, old)) }
      }
      cents
    } finally src.unpersist(blocking = false)
  }

  /** 6dp-rounded cosine distance between a float-array vector column
    * and a double-array centroid column — the pinned metric every
    * lloydTrain iteration (and its DuckDB replay) agrees on. */
  def lloydDist(v: org.apache.spark.sql.Column,
                cent: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val vd = v.cast("array<double>")
    val dp = aggregate(zip_with(vd, cent, (x, y) => x * y), lit(0.0), _ + _)
    val nv = sqrt(aggregate(transform(vd, x => x * x), lit(0.0), _ + _))
    val nc = sqrt(aggregate(transform(cent, y => y * y), lit(0.0), _ + _))
    round(lit(1.0) - dp / (nv * nc), 6)
  }

  /** One assignment pass against double-precision centroids with the
    * 6dp-rounded cosine distance lloydTrain fixes (ties → lower
    * centroid_id). Same partial-aggregatable min(struct) argmin as
    * ivfAssign. */
  def lloydAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    emb.as("v").crossJoin(broadcast(centroids.as("cent")))
      .withColumn("dist", lloydDist(col("v.embedding"), col("cent.cent")))
      .groupBy(col("v.vec_id").as("vec_id"))
      .agg(min(struct(col("dist"), col("cent.centroid_id").as("centroid_id"),
        col("v.embedding").as("embedding"))).as("m"))
      .select(col("vec_id"), col("m.centroid_id").as("centroid_id"),
        col("m.embedding").as("embedding"))
  }

  /** Product quantization (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the
    * vector splits into `m` contiguous subvectors, each quantized by
    * its own small codebook — m·log2(k) bits per vector instead of
    * dims·32, the compression leg the IVF family serves against at
    * scale. Codebooks train through the same 6dp-pinned Lloyd loop as
    * the coarse quantizer (one loop per subspace, memoized on the
    * sliced plan), so the whole train→encode pipeline replays exactly
    * in the DuckDB oracle. Sub-distance is the engine's pinned cosine
    * metric, applied per subspace.
    *
    * Returns per subspace the trained codebook. Encode/ADC below are
    * the serving halves: encoding is m broadcast-argmin passes
    * (union of m keyed plans — no shuffle grows with m beyond the
    * output itself). */
  def pqTrain(emb: DataFrame, m: Int, k: Int, iters: Int)
      : Seq[(Int, Seq[(Long, Seq[Double])])] = {
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val sub = dims / m
    (0 until m).map { s =>
      s -> lloydTrain(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        k, iters)
    }
  }

  /** PQ codes: `(vec_id, subspace, code)` — one argmin assignment per
    * subspace against its broadcast codebook. */
  def pqEncode(emb: DataFrame, m: Int, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val sub = dims / m
    pqTrain(emb, m, k, iters).map { case (s, cents) =>
      lloydAssign(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        cents.toDF("centroid_id", "cent"))
        .select(col("vec_id"), lit(s.toLong).as("subspace"),
          col("centroid_id").as("code"))
    }.reduce(_ unionByName _)
  }

  /** Asymmetric-distance top-k: queries stay full precision, the
    * corpus is its PQ codes — per query the m×k sub-distance table is
    * computed once (a broadcast-sized frame), then one equi-join on
    * (subspace, code) + a per-(query, vector) fold ranks the corpus.
    * The scan cost is |codes| = m rows per corpus vector of 8-byte
    * keys — the point of PQ serving at 100 TB. */
  def pqAdcTopK(emb: DataFrame, queries: DataFrame, m: Int, k: Int,
                iters: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val sub = dims / m
    val codes = pqEncode(emb, m, k, iters)
    val cbooks = pqTrain(emb, m, k, iters).flatMap { case (s, cents) =>
      cents.map { case (cid, cent) => (s.toLong, cid, cent) }
    }.toDF("subspace", "code", "cent")
    val qsub = queries.select(col("vec_id").as("query_id"), col("embedding"))
      .crossJoin(broadcast(cbooks))
      .withColumn("qs",
        slice(col("embedding"), col("subspace").cast("int") * sub + 1, lit(sub)))
      .select(col("query_id"), col("subspace"), col("code"),
        lloydDist(col("qs"), col("cent")).as("sd"))
    // sum EXACT integer micros, not the 6dp doubles: the sub-distances
    // are already on the rounding grid, so a float sum lands exactly ON
    // a round(_, 6) boundary and the result flips with summation order
    // (parallel aggregation order is nondeterministic in any engine)
    codes.join(qsub, Seq("subspace", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg((sum(round(col("sd") * 1e6).cast("long")) / 1e6).as("adc_dist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rk").cast("long").as("rk"))
  }

  /** The IVF serving index: the cell assignment plus the rerank norm,
    * with the cell id exposed as `bucket` so the probe shares
    * rerankByBucket with the LSH family. Persisted bucketed on
    * `bucket`, a probe reads each queried cell co-partitioned —
    * assignment runs once at build time, never per query. */
  def ivfIndexFrame(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus, centroids)
      .withColumnRenamed("centroid_id", "bucket")
      .withColumn("nrm", sqrt(fastNormSq(col("embedding"))))

  /** Probe a stored IVF index: queries pay one broadcast-centroid
    * assignment (|Q| × k dots), then the exact cosine rerank inside
    * their own cell. */
  def ivfProbe(index: DataFrame, centroids: DataFrame, queries: DataFrame,
               k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = ivfAssign(queries, centroids)
      .withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
      .withColumn("probe", col("centroid_id"))
    rerankByBucket(q, index, k)
  }

  // ---- index drift monitoring (serving-side QA) ----------------------

  /** Assignment WITH the winning distance retained — the drift
    * monitor needs how far each vector sits from its centroid, not
    * just which cell it landed in. */
  def lloydAssignDist(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.as("v").crossJoin(broadcast(centroids.as("cent")))
      .withColumn("dist", lloydDist(col("v.embedding"), col("cent.cent")))
      .groupBy(col("v.vec_id").as("vec_id"))
      .agg(min(struct(col("dist"), col("cent.centroid_id").as("centroid_id"))).as("m"))
      .select(col("vec_id"), col("m.centroid_id").as("centroid_id"),
        col("m.dist").as("dist"))

  /** Index staleness / distribution-drift monitor — the vector-index
    * twin of Bpe.coverage: the serving-side QA that decides when the
    * quantizer retrains. Both sides assign under the SAME stored
    * centroids (in production the corpus numbers come off the
    * persisted assignment table; the batch pays |B|·k broadcast
    * dots — the corpus never rescans). Per cell: occupancy share and
    * mean assignment distance on each side. Diverging shares mean the
    * index no longer balances the load (hot cells → skewed probes);
    * a rising batch-side mean distance means the centroids no longer
    * describe the incoming data. Mean distances aggregate as integer
    * micro-units (the Lloyd-recenter trick), so the result is
    * partial-order invariant and the DuckDB oracle replays it
    * exactly. */
  /** Embedding outlier gate: flag vectors whose assignment distance
    * sits more than 3σ ABOVE their cell's mean — the corrupt-vector /
    * off-manifold filter a corpus runs before trusting its embedding
    * space (a zeroed or garbage vector lands far from every centroid
    * and quietly poisons dedup thresholds and ANN recall).
    *
    * Exact integer algebra end to end: distances are 6dp-pinned, so
    * micro-units are integers; the 3σ test is the cross-multiplied
    * form (n·du − Σdu)² > 9·(n·Σdu² − (Σdu)²) over decimal(38,0) —
    * no float mean, no float variance, no rounding divergence, and
    * Σdu² stays exact where a 64-bit sum would overflow at corpus
    * scale. One-sided by construction: tight vectors are fine,
    * far ones are the defect.
    *
    * EXACTNESS BOUND (Spark decimal overflow yields NULL, not a
    * wrong bit): with cosine distance, du ≤ 2·10⁶, so per cell of n
    * vectors |dev| = |n·du − Σdu| < n·2·10⁶ and both dev² and
    * 9·(n·Σdu² − Σdu²-squared) stay under 38 digits while
    * n < ~5·10¹² — i.e. five TRILLION vectors in ONE cell, ~10⁴×
    * the entire vector count of a 100 TB float32 corpus, and the
    * quantizer exists precisely to keep cells far smaller. The
    * bound is recorded as [[outlierMaxCell]] so callers can assert
    * it instead of degrading to NULL verdicts past it.
    *
    * Shape: one k-row stats aggregate over the assignment frame,
    * broadcast back — cost is the assignment scan it already shares
    * with the IVF family. */
  val outlierMaxCell: Long = 5_000_000_000_000L

  def assignmentOutliers(assigned: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val a = assigned.withColumn("du", round(col("dist") * 1e6).cast("long"))
    val stats = a.groupBy("centroid_id").agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("du").cast(dec)).as("s1"),
      sum(col("du").cast(dec) * col("du")).as("s2"))
    a.join(broadcast(stats), "centroid_id")
      .withColumn("dev", col("n") * col("du") - col("s1"))
      .withColumn("is_outlier", col("dev") > 0 &&
        col("dev") * col("dev") >
          lit(9) * (col("n") * col("s2") - col("s1") * col("s1")))
      .select(col("vec_id"), col("centroid_id"), col("dist"),
        col("is_outlier"))
  }

  def indexDrift(centroids: DataFrame, corpus: DataFrame,
                 batch: DataFrame): DataFrame = {
    def cellStats(df: DataFrame, n: String, md: String): DataFrame =
      lloydAssignDist(df, centroids)
        .groupBy("centroid_id")
        .agg(count(lit(1)).as(n),
          sum(round(col("dist") * 1e6).cast("long")).as(s"__u$md"))
        .withColumn(md, round(col(s"__u$md") / col(n) / 1e6, 6))
        .drop(s"__u$md")
    val c = cellStats(corpus, "corpus_n", "corpus_mean_dist")
    val b = cellStats(batch, "batch_n", "batch_mean_dist")
    // every stored cell appears (empty cells are a drift signal too);
    // totals ride as 1-row in-plan broadcasts, never a driver round trip
    val joined = centroids.select("centroid_id")
      .join(c, Seq("centroid_id"), "left")
      .join(b, Seq("centroid_id"), "left")
      .na.fill(0L, Seq("corpus_n", "batch_n"))
    val totals = joined.agg(sum(col("corpus_n")).as("ct"), sum(col("batch_n")).as("bt"))
    joined.crossJoin(broadcast(totals))
      .select(col("centroid_id"), col("corpus_n"), col("batch_n"),
        round(col("corpus_n") / col("ct"), 6).as("corpus_frac"),
        round(col("batch_n") / col("bt"), 6).as("batch_frac"),
        col("corpus_mean_dist"), col("batch_mean_dist"),
        round(abs(col("corpus_n") / col("ct") - col("batch_n") / col("bt")), 6)
          .as("share_gap"))
  }

  // ---- hard-negative mining (contrastive training) -------------------

  /** Hard-negative mining — the contrastive-training curriculum step
    * (DPR / SimCSE): for each query vector, the k most-similar corpus
    * vectors whose `label` DIFFERS. Near-misses across the class
    * boundary are where the contrastive gradient lives; random
    * negatives are trivially separable and teach nothing. The class
    * exclusion is a JOIN predicate, so rank k means "k-th nearest
    * cross-class neighbor" — never "cross-class survivors of an
    * overall top-k", which can silently return fewer than k. Exact
    * form: |Q|·|C| dots, the oracle baseline. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
    val q = queries.withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
    rankNegatives(q.as("q").join(c.as("c"),
      col("q.vec_id") =!= col("c.vec_id")
        && col("q.label") =!= col("c.label")), k)
  }

  /** The scale form: candidates come from the sign-LSH bucket join —
    * a probe costs |Q| bucket lookups, never |Q|·|C| — with the label
    * exclusion riding the SAME join, and the exact-cosine rerank
    * running inside the bucket. Rank is "k-th nearest cross-class
    * bucket-mate" (approximate, like every ANN; the recall knob is
    * nPlanes). This is the mining pass a 100 TB corpus can afford:
    * pair it with the persisted [[annIndexFrame]] layout and mining a
    * new query batch touches only its own buckets. */
  def hardNegativesAnn(corpus: DataFrame, queries: DataFrame, k: Int,
                       nPlanes: Int = lshPlanes): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    def prep(df: DataFrame) = lshBucket(df, nPlanes)
      .select("vec_id", "embedding", "label", "bucket")
      .withColumn("nrm", sqrt(fastNormSq(col("embedding"))))
    rankNegatives(prep(queries).as("q").join(prep(corpus).as("c"),
      col("q.bucket") === col("c.bucket")
        && col("q.vec_id") =!= col("c.vec_id")
        && col("q.label") =!= col("c.label")), k)
  }

  private def rankNegatives(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined.withColumn("cos", round(
      fastDot(col("q.embedding"), col("c.embedding"))
        / (col("q.nrm") * col("c.nrm")), 6))
    val w = Window.partitionBy(col("q.vec_id"))
      .orderBy(col("cos").desc, col("c.vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("negative_id"),
        col("cos"), col("rk"))
  }

  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    // argmin as min(struct(dist, id)) — lexicographic struct ordering
    // reproduces (dist ASC, centroid_id ASC) tie-breaking, but unlike a
    // row_number window it's a partial-aggregatable hash agg: map-side
    // combine collapses each vector's |centroids| rows before any
    // exchange, and nothing is globally sorted. The embedding rides
    // along inside the min-struct so no second join is needed.
    emb.as("v")
      .crossJoin(broadcast(centroids.as("cent")))
      .withColumn("d", lit(1.0) - fastCosine(col("v.embedding"), col("cent.embedding")))
      .groupBy(col("v.vec_id").as("vec_id"))
      .agg(min(struct(col("d"), col("cent.centroid_id").as("centroid_id"),
        col("v.embedding").as("embedding"))).as("m"))
      .select(col("vec_id"), col("m.embedding").as("embedding"),
        col("m.centroid_id").as("centroid_id"))
  }

  // ------------------------------------------------------------------
  // IVF-PQ (IVFADC — Jégou, Douze & Schmid 2011 §IV): the coarse
  // quantizer routes each vector to a cell, PQ encodes the RESIDUAL
  // (vector − cell centroid), and a query probes only its nprobe
  // nearest cells with per-cell ADC tables. Residuals cluster around
  // the origin, where the cosine metric degenerates (norms → 0 make
  // the ratio unstable), so the residual codebooks train under a
  // squared-L2 twin of the pinned Lloyd loop — division-free, same
  // 6dp rounding contract, so the whole composed train→encode→search
  // path still replays exactly in the DuckDB oracle.
  // ------------------------------------------------------------------

  /** 6dp-rounded squared-L2 distance between a (float or double)
    * array column and a double-array centroid column — the pinned
    * metric of the residual Lloyd loop. No sqrt: squared L2 ranks
    * identically and keeps the replay to one rounding site. */
  def lloydDistL2(v: org.apache.spark.sql.Column,
                  cent: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(aggregate(zip_with(v.cast("array<double>"), cent,
      (x, y) => (x - y) * (x - y)), lit(0.0), _ + _), 6)

  /** Argmin assignment under the pinned squared-L2 metric (ties →
    * lower centroid_id) — same partial-aggregatable min-struct shape
    * as lloydAssign. */
  def lloydAssignL2(emb: DataFrame, centroids: DataFrame): DataFrame = {
    emb.as("v").crossJoin(broadcast(centroids.as("cent")))
      .withColumn("dist", lloydDistL2(col("v.embedding"), col("cent.cent")))
      .groupBy(col("v.vec_id").as("vec_id"))
      .agg(min(struct(col("dist"), col("cent.centroid_id").as("centroid_id"),
        col("v.embedding").as("embedding"))).as("m"))
      .select(col("vec_id"), col("m.centroid_id").as("centroid_id"),
        col("m.embedding").as("embedding"))
  }

  /** Squared-L2 Lloyd training over a double-array embedding column —
    * same closed-form init (k lowest vec_ids), 6dp-pinned iterations,
    * empty-cluster carry-forward, and session memo as the cosine
    * loop. Input arrays may be float or double; state is doubles. */
  def lloydTrainL2(emb: DataFrame, k: Int, iters: Int): Seq[(Long, Seq[Double])] =
    lloydMemoized("l2", emb, k, iters)(lloydTrainL2Impl(emb, k, iters))

  private def lloydTrainL2Impl(emb: DataFrame, k: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val src = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding")).persist()
    try {
      var cents: Seq[(Long, Seq[Double])] =
        src.orderBy("vec_id").limit(k).collect()
          .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }.toSeq
      (1 to iters).foreach { _ =>
        val assigned = lloydAssignL2(src, cents.toDF("centroid_id", "cent"))
        val means = assigned
          .select(col("centroid_id"), posexplode(col("embedding")))
          .groupBy(col("centroid_id"), col("pos"))
          // order-independent mean: per-value integer micros, an exact
          // integer sum, one rounded division — round(avg(), 6) sits at
          // a grid boundary whenever the true mean does, and parallel
          // summation order then flips the 6th decimal run-to-run
          .agg((round(sum(round(col("col").cast("double") * 1e6).cast("long"))
              / count(lit(1))).cast("long") / 1e6).as("v"))
          .collect()
        val byCid = means.groupBy(_.getLong(0)).map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        cents = cents.map { case (cid, old) => (cid, byCid.getOrElse(cid, old)) }
      }
      cents
    } finally src.unpersist(blocking = false)
  }

  /** Coarse assignment + 6dp-pinned residuals: (vec_id, centroid_id,
    * embedding = v − cell centroid, as doubles). The IVFADC encode
    * input — one broadcast argmin pass plus a broadcast centroid
    * join; the corpus never shuffles. */
  def ivfResiduals(emb: DataFrame, coarse: Seq[(Long, Seq[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = coarse.toDF("centroid_id", "cent")
    lloydAssign(emb, cents)
      .join(broadcast(cents), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("embedding").cast("array<double>"), col("cent"),
          (x, c) => round(x - c, 6)).as("embedding"))
  }

  /** IVF-PQ codebooks: the coarse quantizer is the engine's shared
    * cosine Lloyd loop (memoized — the IVF serving family and IVFADC
    * quantize with the SAME cells), the m residual codebooks train
    * under the squared-L2 loop on contiguous residual slices. */
  def ivfPqTrain(emb: DataFrame, kc: Int, coarseIters: Int, m: Int, k: Int,
                 iters: Int): (Seq[(Long, Seq[Double])], Seq[(Int, Seq[(Long, Seq[Double])])]) = {
    val coarse = lloydTrain(emb, kc, coarseIters)
    // NOT staged (r21 A/B): the residual frame is a broadcast-argmin
    // projection — recomputing it per sub-codebook is cheaper than a
    // localCheckpoint round-trip (measured: staging regressed
    // sim_ivfpq_recall 1.9 s → 3.2 s). The guide §5 caching rule:
    // materialize only when recompute beats the memory traffic.
    val res = ivfResiduals(emb, coarse)
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val sub = dims / m
    val books = (0 until m).map { s =>
      s -> lloydTrainL2(
        res.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        k, iters)
    }
    (coarse, books)
  }

  /** The composed index content: (vec_id, centroid_id, subspace,
    * code) — the cell routes the probe, the m codes reconstruct the
    * residual. m·log2(k) bits + one cell id per vector; at 100 TB
    * this frame (persisted bucketed on centroid_id) IS the index. */
  def ivfPqEncode(emb: DataFrame, kc: Int, coarseIters: Int, m: Int, k: Int,
                  iters: Int): DataFrame = {
    val (coarse, books) = ivfPqTrain(emb, kc, coarseIters, m, k, iters)
    ivfPqEncodeWith(emb, coarse, books)
  }

  private def ivfPqEncodeWith(emb: DataFrame, coarse: Seq[(Long, Seq[Double])],
                              books: Seq[(Int, Seq[(Long, Seq[Double])])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // NOT staged — same A/B as ivfPqTrain: the projection is cheaper
    // recomputed than checkpointed.
    val res = ivfResiduals(emb, coarse)
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val sub = dims / books.length
    val codes = books.map { case (s, cents) =>
      lloydAssignL2(
        res.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        cents.toDF("centroid_id", "cent"))
        .select(col("vec_id"), lit(s.toLong).as("subspace"),
          col("centroid_id").as("code"))
    }.reduce(_ unionByName _)
    codes.join(res.select(col("vec_id"), col("centroid_id")), "vec_id")
      .select(col("vec_id"), col("centroid_id"), col("subspace"), col("code"))
  }

  /** IVFADC search: each query routes to its nprobe nearest coarse
    * cells, computes ONE residual + m×k sub-distance table per probed
    * cell (|Q|·nprobe·m·k rows — broadcast-sized), and scans only the
    * codes of those cells via a (cell, subspace, code) equi-join. The
    * corpus-side cost is the probed cells' code rows — 8-byte keys,
    * never the vectors — which is the whole point of IVFADC serving:
    * candidate volume ∝ nprobe/kc of the corpus, scan width m bytes. */
  def ivfPqAdcTopK(emb: DataFrame, queries: DataFrame, kc: Int, coarseIters: Int,
                   m: Int, k: Int, iters: Int, nprobe: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (coarse, books) = ivfPqTrain(emb, kc, coarseIters, m, k, iters)
    val codes = ivfPqEncodeWith(emb, coarse, books)
    val dims = emb.select(size(col("embedding"))).first().getInt(0)
    val cents = coarse.toDF("centroid_id", "cent")
    val bookDf = books.flatMap { case (s, cs) =>
      cs.map { case (cid, cent) => (s.toLong, cid, cent) }
    }.toDF("subspace", "code", "cent")
    ivfPqProbe(codes, cents, bookDf, queries, dims / m, nprobe, topK)
  }

  /** IVFADC search against MODEL FRAMES — the serving half, shared by
    * the live path above and the persisted-model path (the frames come
    * from stored tables; no training, no corpus encoding, ever). The
    * query side computes nprobe residuals + m×k sub-distance tables
    * under the same pinned metrics the model was built with; the
    * corpus side is the codes scan alone. */
  def ivfPqProbe(codes: DataFrame, cents: DataFrame, books: DataFrame,
                 queries: DataFrame, sub: Int, nprobe: Int, topK: Int): DataFrame = {
    // nprobe nearest cells under the SAME pinned coarse metric the
    // corpus was assigned with; the per-cell query residual rides along
    val probed = queries.select(col("vec_id").as("query_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", lloydDist(col("embedding"), col("cent")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("centroid_id"))))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("centroid_id").as("cell"),
        zip_with(col("embedding").cast("array<double>"), col("cent"),
          (x, c) => round(x - c, 6)).as("qres"))
    val qs = probed.crossJoin(broadcast(books))
      .select(col("query_id"), col("cell"), col("subspace"), col("code"),
        lloydDistL2(
          slice(col("qres"), col("subspace").cast("int") * sub + 1, lit(sub)),
          col("cent")).as("sd"))
    // exact integer micros — same order-independence fix as pqAdcTopK
    codes.as("c")
      .join(qs.as("q"), col("c.centroid_id") === col("q.cell")
        && col("c.subspace") === col("q.subspace") && col("c.code") === col("q.code"))
      .groupBy(col("q.query_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .agg((sum(round(col("q.sd") * 1e6).cast("long")) / 1e6).as("adc_dist"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rk").cast("long").as("rk"))
  }

  /** Persist-or-load the IVFADC model: the coarse centroid and
    * residual-codebook tables (k and m·k rows — the model artifact),
    * plus the code frame bucketed on the probe's full
    * (centroid_id, subspace, code) equi-join key. A serving session
    * calls this and ivfPqProbe — the train→encode pipeline runs only
    * when the tables don't exist yet (the amortized-once index build;
    * same contract as Dedup.ensurePersistedIndex / Bpe.ensureModel). */
  def ensureIvfPqModel(spark: org.apache.spark.sql.SparkSession, root: String,
                       tag: String, corpus: => DataFrame, kc: Int,
                       coarseIters: Int, m: Int, k: Int, iters: Int,
                       nBuckets: Int = 8): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    lazy val trained = {
      val c = corpus
      val (coarse, books) = ivfPqTrain(c, kc, coarseIters, m, k, iters)
      (coarse, books, ivfPqEncodeWith(c, coarse, books))
    }
    val cents = Bucketing.ensureBucketed(spark, s"ivfpq_cents_$tag",
      s"$root/cents", Seq("centroid_id"), 1) {
      trained._1.toDF("centroid_id", "cent")
    }
    val books = Bucketing.ensureBucketed(spark, s"ivfpq_books_$tag",
      s"$root/books", Seq("subspace", "code"), 1) {
      trained._2.flatMap { case (s, cs) =>
        cs.map { case (cid, cent) => (s.toLong, cid, cent) }
      }.toDF("subspace", "code", "cent")
    }
    val codes = Bucketing.ensureBucketed(spark, s"ivfpq_codes_$tag",
      s"$root/codes", Seq("centroid_id", "subspace", "code"), nBuckets) {
      trained._3
    }
    (codes, cents, books)
  }

  /** The serving loop's hinge between the drift monitor and the model
    * artifact: probe the PERSISTED IVFADC model's drift against an
    * incoming batch and retrain only when the per-cell occupancy shift
    * exceeds `maxShareGap` (max per-cell |corpus_frac − batch_frac|,
    * [[indexDrift]]'s share_gap). Below the threshold the call is
    * TRAINING-FREE and idempotent — the corpus thunk is never
    * evaluated (IndexLifecycleSpec passes a throwing thunk) and the
    * stored tables are returned as-is; above it the replacement model
    * is built FIRST under temp table names in the non-serving
    * generation directory, and only after the full rebuild succeeds
    * does each serving table swap by rename-aside → rename-in →
    * drop-aside — a failure anywhere inside training/encoding leaves
    * the stored model intact and serving (the drop-then-rebuild form
    * had no model registered for the whole retrain window, and a
    * crash stranded the store empty), and a crash INSIDE the swap
    * itself leaves every table registered under some name (final,
    * `__old` aside, or `__new` temp) with both generations' files on
    * disk — recovery is a catalog rename, never a retrain, and the
    * next call performs it AUTOMATICALLY on entry, generation-aware
    * ([[recoverInterruptedSwap]]: the whole table SET rolls forward
    * to the fully-built new generation or back to the old one —
    * never a per-table rename that could serve PQ codes against the
    * wrong generation's centroids); the only residual window is a final name being
    * briefly unbound between its two renames, during which concurrent
    * readers of that one table see transient table-not-found. Generations ping-pong between
    * `$root/gen_a` and `$root/gen_b` so the overwrite never touches
    * files the current model serves from.
    *
    * Monitoring cost: corpus-side occupancy is an aggregate of the
    * stored CODE frame itself (every vector carries its cell id m
    * times, and shares are ratios, so the m factor cancels — the
    * corpus is never rescanned to monitor the index); the batch pays
    * one |B|·kc broadcast-centroid assignment. The per-cell frame is
    * kc rows — model-sized driver state, the same boundary the
    * centroid tables already cross. */
  /** GENERATION-AWARE recovery from a crash inside the per-table swap
    * loop, run on entry to every refresh. The naive per-table form —
    * "an unbound final with a live `__old` aside is renamed back in" —
    * could silently serve a MIXED-generation model: with the loop
    * order (cents, books, codes), a crash after cents fully swapped
    * and books renamed-aside leaves cents already NEW-generation;
    * renaming books' OLD aside back in then passes the existence
    * require with PQ codes querying the wrong generation's centroids.
    *
    * A table's generation is its location's parent directory (all
    * three tables of one generation live under one root — `$root`,
    * `$root/gen_a` or `$root/gen_b`). Recovery only engages when the
    * swap provably STARTED (an unbound final, or bound finals in
    * mixed generations — a merely-stranded partial `__new` build with
    * a healthy uniform serving set is NOT touched; the next drifted
    * refresh drops and rebuilds it). It then rolls the whole set the
    * same way:
    *  - FORWARD when every table has the new generation available
    *    (under its final or `__new` name) — completing each table
    *    with the same rename-aside → rename-in → drop-aside steps,
    *    so a crash inside recovery lands back in a recoverable state;
    *  - otherwise BACK, renaming `__old` asides in (only possible
    *    when no table already serves the new generation — mixed
    *    finals always have their `__new`s, because temps are all
    *    built before the first rename);
    *  - and fails loudly when neither generation is complete rather
    *    than serve a mixed model. */
  private def recoverInterruptedSwap(spark: org.apache.spark.sql.SparkSession,
                                     tables: Seq[String], tag: String): Unit = {
    def aside(fin: String) = fin.stripSuffix(s"_$tag") + s"_${tag}__old"
    def temp(fin: String) = fin.stripSuffix(s"_$tag") + s"_${tag}__new"
    def locOf(t: String): Option[String] =
      if (!spark.catalog.tableExists(t)) None
      else Some(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString)
    def genOf(loc: String): String = {
      val l = loc.stripSuffix("/")
      l.substring(0, math.max(l.lastIndexOf('/'), 0))
    }
    val finGen = tables.map(t => t -> locOf(t).map(genOf)).toMap
    val tmpGen = tables.map(t => t -> locOf(temp(t)).map(genOf)).toMap
    val boundGens = finGen.values.flatten.toSeq.distinct
    val unbound = tables.filter(t => finGen(t).isEmpty &&
      (spark.catalog.tableExists(aside(t)) || tmpGen(t).nonEmpty))
    if (unbound.isEmpty && boundGens.size <= 1) return // healthy
    val newGen = tmpGen.values.flatten.toSeq.distinct match {
      case Seq(g) => Some(g)
      case Seq() =>
        // no temps anywhere: only a pure rename-aside crash state is
        // reachable (mixed finals imply live temps) — roll back
        None
      case gs => throw new IllegalStateException(
        s"IVFADC swap recovery: __new temps span generations $gs for " +
          s"tag '$tag' — manual cleanup required")
    }
    newGen match {
      case Some(ng) if tables.forall(t =>
          finGen(t).contains(ng) || tmpGen(t).contains(ng)) =>
        tables.foreach { fin =>
          if (!finGen(fin).contains(ng)) {
            spark.sql(s"DROP TABLE IF EXISTS ${aside(fin)}")
            if (finGen(fin).nonEmpty)
              spark.sql(s"ALTER TABLE $fin RENAME TO ${aside(fin)}")
            spark.sql(s"ALTER TABLE ${temp(fin)} RENAME TO $fin")
          }
          spark.sql(s"DROP TABLE IF EXISTS ${aside(fin)}")
          spark.sql(s"DROP TABLE IF EXISTS ${temp(fin)}")
        }
      case None if tables.forall(t => finGen(t).nonEmpty ||
          spark.catalog.tableExists(aside(t))) && boundGens.size <= 1 =>
        tables.foreach { fin =>
          if (finGen(fin).isEmpty)
            spark.sql(s"ALTER TABLE ${aside(fin)} RENAME TO $fin")
        }
      case _ => throw new IllegalStateException(
        s"IVFADC swap recovery: neither generation is complete for tag " +
          s"'$tag' (finals: $finGen, temps: $tmpGen) — manual cleanup required")
    }
  }

  def refreshIvfPqIfDrifted(spark: org.apache.spark.sql.SparkSession, root: String,
                            tag: String, corpus: => DataFrame, batch: DataFrame,
                            maxShareGap: Double, kc: Int, coarseIters: Int,
                            m: Int, k: Int, iters: Int, nBuckets: Int = 8)
      : (DataFrame, DataFrame, DataFrame, Boolean) = {
    val tables = Seq(s"ivfpq_cents_$tag", s"ivfpq_books_$tag", s"ivfpq_codes_$tag")
    recoverInterruptedSwap(spark, tables, tag)
    require(tables.forall(spark.catalog.tableExists),
      s"no stored IVFADC model under tag '$tag' — build with ensureIvfPqModel first")
    val cents = spark.table(tables.head)
    val codes = spark.table(tables(2))
    val corpusOcc = codes.groupBy("centroid_id").agg(count(lit(1)).as("cn"))
    val batchOcc = lloydAssignDist(batch, cents)
      .groupBy("centroid_id").agg(count(lit(1)).as("bn"))
    val perCell = cents.select("centroid_id")
      .join(corpusOcc, Seq("centroid_id"), "left")
      .join(batchOcc, Seq("centroid_id"), "left")
      .na.fill(0L, Seq("cn", "bn"))
      .collect()
    val ct = perCell.map(_.getAs[Long]("cn")).sum.toDouble
    val bt = perCell.map(_.getAs[Long]("bn")).sum.toDouble
    val gap =
      if (ct == 0 || bt == 0) 0.0
      else perCell.map(r =>
        math.abs(r.getAs[Long]("cn") / ct - r.getAs[Long]("bn") / bt)).max
    if (gap <= maxShareGap) (codes, cents, spark.table(tables(1)), false)
    else {
      // staged swap: build the replacement FIRST under temp names in
      // the non-serving generation dir; only a fully-built model ever
      // replaces the serving one. DROP on these external tables only
      // unregisters — the generation ping-pong is what keeps the
      // rebuild's overwrite away from the files still being served.
      val servingLoc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tables.head))
        .location.toString
      val newRoot =
        if (servingLoc.contains("/gen_a/")) s"$root/gen_b" else s"$root/gen_a"
      // suffix-anchored name derivation: a bare replace() of "_$tag"
      // hits the FIRST occurrence and miscomputes names for tags that
      // repeat a table-name word (tag "cents" → "ivfpq_cents_cents")
      val tmpTag = s"${tag}__new"
      val oldTag = s"${tag}__old"
      val tmpTables = tables.map(_.stripSuffix(s"_$tag") + s"_$tmpTag")
      val oldTables = tables.map(_.stripSuffix(s"_$tag") + s"_$oldTag")
      // a crashed earlier refresh may have stranded temp/aside tables;
      // dropping them forces ensureIvfPqModel to rebuild fresh
      (tmpTables ++ oldTables).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      ensureIvfPqModel(spark, newRoot, tmpTag, corpus,
        kc, coarseIters, m, k, iters, nBuckets)
      // rename-aside → rename-in → drop-aside: every step leaves each
      // table live under SOME catalog name, so a crash mid-swap is
      // recoverable by rename (see scaladoc) — never a lost model
      tables.zip(tmpTables).zip(oldTables).foreach { case ((fin, tmp), old) =>
        spark.sql(s"ALTER TABLE $fin RENAME TO $old")
        spark.sql(s"ALTER TABLE $tmp RENAME TO $fin")
        spark.sql(s"DROP TABLE IF EXISTS $old")
      }
      (spark.table(tables(2)), spark.table(tables.head), spark.table(tables(1)), true)
    }
  }
}
