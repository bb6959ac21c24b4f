package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so the engine
  * can materialize DataFrames from its own logical nodes
  * (GreedyAllocationNode). Spark offers no public API for this; the
  * in-package object is the standard library-extension technique. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Constraint-free lazy local checkpoint — the staging primitive
    * for frames that are re-used across several joins of ONE query.
    *
    * `Dataset.localCheckpoint` stamps the resulting LogicalRDD with
    * the optimized plan's `originConstraints`, expressed on the
    * ORIGINAL exprIds. When the staged frame's lineage shares source
    * attributes with another frame in the same final query (the
    * normal case: both sides of an incremental-dedup read the same
    * table), InferFiltersFromConstraints re-applies those constraints
    * to ANY operator outputting those exprIds — measured concretely:
    * a checkpointed batch frame's `vec_id >= cut OR vec_id <=> id`
    * union constraint was injected into the CORPUS-side scan of the
    * same dominance query, turning it into an always-false filter and
    * silently emptying the corpus join (IncrementalDedupSpec caught
    * it). This helper wraps the checkpointed RDD in a bare LogicalRDD
    * with NO origin stats/constraints, so nothing can leak; the cost
    * is only that downstream loses inherited partitioning/ordering
    * info, which the staged-frame call sites reshuffle anyway.
    *
    * When is plain `localCheckpoint` still safe? Constraints are
    * expressed over the frame's OUTPUT attributes, so the leak needs
    * the staged output to pass source attributes through UN-ALIASED
    * (a filter/join keeps the exprId; `col.as("x")` mints a fresh
    * one). Graph/Bpe/Curation stage frames whose outputs are all
    * aliases or aggregate results — fresh exprIds, nothing for
    * InferFiltersFromConstraints to bind elsewhere — and they keep
    * Dataset.localCheckpoint for its unpersist() discipline. Frames
    * that forward raw source ids (the dedup family's vec_id) MUST
    * come through here. */
  def stageLocal(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    stagedRdds.synchronized {
      stagedRdds.filterInPlace(_.get != null) // prune GC-cleared slots
      stagedRdds += new java.lang.ref.WeakReference(rdd)
    }
    ofRows(df.sparkSession, org.apache.spark.sql.execution.LogicalRDD(
      qe.analyzed.output, rdd)(ds.sparkSession))
  }

  /** RDDs checkpointed by [[stageLocal]] since the last release,
    * held WEAKLY — the explicit-cleanup half of the staging contract.
    * Weak references matter for library callers that never reach a
    * [[releaseStaged]] boundary (Dedup.semDedup, Similarity et al. in
    * a user's long-lived session): the returned LogicalRDD is the only
    * strong reference, so once the caller drops the frame the
    * ContextCleaner reclaims the checkpoint blocks as usual. A strong
    * registry here would pin every staged block for the JVM lifetime
    * and defeat that fallback. */
  private val stagedRdds = scala.collection.mutable.ArrayBuffer
    .empty[java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]

  /** Unpersist every staged checkpoint block still reachable. Call at
    * a CONSUME boundary — after the frames built on staged lineage
    * have been materialized (Bench between queries, Rehearsal between
    * cases): a released frame re-materialized later fails loudly
    * (checkpoint block gone), it never silently recomputes. Without a
    * call, reclamation falls to the ContextCleaner once the RDDs go
    * unreferenced (the registry is weak, so it never blocks that).
    *
    * CONTRACT: this is a process-global boundary — it assumes ONE
    * in-flight query stream per JVM (the Bench/Verify/Rehearsal
    * harness shape). With concurrent queries on a shared session,
    * thread B's boundary would unpersist thread A's still-in-flight
    * staged blocks and fail A's query; concurrent callers should skip
    * the hook and rely on the weak-registry + ContextCleaner path. */
  def releaseStaged(): Unit = stagedRdds.synchronized {
    stagedRdds.foreach { ref =>
      val rdd = ref.get
      if (rdd != null) rdd.unpersist(blocking = false)
    }
    stagedRdds.clear()
  }
}
