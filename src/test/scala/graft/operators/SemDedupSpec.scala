package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup verdict semantics: pairwise dominance inside trained
  * cells — the centroid-CLOSER member of a cosine-near pair drops,
  * ties break to the lower vec_id, untouched vectors keep. */
class SemDedupSpec extends SparkSpec {

  test("semDedup drops exactly the centroid-closer member of each near pair") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = (0 until 300).map(i => (i.toLong, vec()))
    val planted = (0 until 10).map { i =>
      (1000L + i, base(i)._2.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 4, iters = 4).toDF("centroid_id", "cent")

    val res = Dedup.semDedup(df, cents, 0.9)
    val rows = res.collect()
    assert(rows.length == 310, "every vector gets a verdict row")

    // reference verdict recomputed from the operator's own building
    // blocks: near pairs within cells + assignment distances
    val assigned = Similarity.lloydAssignDist(df, cents)
    val dist = assigned.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cellEmb = df.join(assigned.select("vec_id", "centroid_id"), Seq("vec_id"))
    val pairs = Dedup.embeddingNearDupsBy(cellEmb, "centroid_id", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedLosers = pairs.map { case (a, b) =>
      if (dist(a) >= dist(b)) b else a // id_a < id_b: tie keeps the lower id
    }.toSet
    assert(pairs.nonEmpty, "fixture must actually plant in-cell near pairs")

    val dropped = rows.filter(!_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(dropped == expectedLosers,
      s"verdict mismatch: dropped=$dropped expected=$expectedLosers")

    // each planted pair that shares a cell loses exactly its closer member
    val cell = assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 10).map(i => (i.toLong, 1000L + i))
      .filter { case (a, b) => cell(a) == cell(b) }
      .foreach { case (a, b) =>
        val loser = if (dist(a) >= dist(b)) b else a
        assert(dropped.contains(loser), s"pair ($a,$b): closer member $loser kept")
      }
  }

  test("semDedup keeps everything when the threshold excludes all pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 2, iters = 2).toDF("centroid_id", "cent")
    val res = Dedup.semDedup(df, cents, 1.1) // cosine can't reach 1.1
    assert(res.filter(!col("kept")).count() == 0)
    assert(res.count() == 50)
  }

  test("a maxCell cap above every cell size is a no-op") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 3, iters = 3).toDF("centroid_id", "cent")
    def verdicts(mc: Int) = Dedup.semDedup(df, cents, 0.3, maxCell = mc)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts(100000) == verdicts(0),
      "nsub = 1 everywhere must reproduce the uncapped verdict exactly")
  }

  test("sample-trained quantizer: verdicts drift only at cell boundaries, planted twins still drop") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = (0 until 400).map(i => (i.toLong, vec()))
    val planted = (0 until 20).map { i =>
      (2000L + i, base(i)._2.map(x => x + 0.005f * rng.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val full = Dedup.semDedup(df,
        Similarity.lloydTrain(df, 4, 4).toDF("centroid_id", "cent"), 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val sampled = Dedup.semDedupSampled(df, 0.9, maxCell = 0,
        k = 4, iters = 4, sampleMod = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(sampled.size == 420, "every vector still gets a verdict row")
    // detection quality: a twin pair is caught iff both members land
    // in one cell, and twins near a Voronoi boundary can straddle
    // under EITHER quantizer — so the honest claim is that sampled
    // training catches ~as many planted twins as full training, not
    // an absolute count
    val fullPlanted = planted.count { case (id, _) => !full(id) }
    val sampledPlanted = planted.count { case (id, _) => !sampled(id) }
    assert(fullPlanted > 0, "fixture must plant catchable twins")
    assert(sampledPlanted >= fullPlanted - 3,
      s"sampled training detection quality: $sampledPlanted vs full's $fullPlanted")
    // drift is bounded: verdicts only change where the two quantizers
    // disagree on blocking, which the cosine-0.9 pairs rarely straddle
    val agree = sampled.count { case (id, v) => full(id) == v }
    assert(agree >= (sampled.size * 0.95).toInt,
      s"sample-vs-full verdict drift too high: $agree/${sampled.size} agree")
  }

  test("hash-residue sub-slices keep cross-parity pairs on id-striped corpora") {
    import spark.implicits._
    // ids striped by parity — the engine's own cross-corpus convention
    // (even/odd sides, id·mult+rep salting): base vectors on EVEN ids,
    // every planted near-twin on the adjacent ODD id. With the cap
    // forcing nsub = 2, a raw-id residue puts every (even, odd) pair
    // in different slices — the capped verdict would drop NOTHING —
    // while the md5-hash residue thins the cell uniformly and keeps a
    // same-slice share of the planted pairs (~1/2 in expectation,
    // deterministic given the hash)
    val rng = new scala.util.Random(43)
    val base = (0 until 100).map(i =>
      (2L * i, Array.fill(64)(rng.nextGaussian().toFloat)))
    val planted = base.take(40).map { case (id, v) =>
      (id + 1L, v.map(x => x + 0.004f * rng.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 2, iters = 3).toDF("centroid_id", "cent")
    // ~70 vectors per cell; maxCell = 40 → nsub = 2 for both cells
    val dropped = Dedup.semDedup(df, cents, 0.9, maxCell = 40)
      .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty,
      "an even slice count annihilated every cross-parity planted pair — " +
        "the sub-split is slicing on the raw id, not the id hash")
    // and they are a subset of the uncapped drops (the cap-only-loses law)
    val uncapped = Dedup.semDedup(df, cents, 0.9)
      .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(uncapped))
  }

  test("the cap only removes cross-slice comparisons, never adds drops") {
    import spark.implicits._
    val rng = new scala.util.Random(37)
    val base = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    // near-twins at id+1200: the md5-hash slice puts a pair in one
    // slice with chance ~1/nsub, and the hash is deterministic — with
    // 20 planted pairs and nsub <= 6 the fixture reliably leaves
    // same-slice survivors (capped.nonEmpty re-checks it)
    val planted = (0 until 20).map { i =>
      (1200L + i, base(i)._2.map(x => x + 0.005f * rng.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val cents = Similarity.lloydTrain(df, 2, iters = 3).toDF("centroid_id", "cent")
    val uncapped = Dedup.semDedup(df, cents, 0.9)
      .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    val capped = Dedup.semDedup(df, cents, 0.9, maxCell = 40)
      .filter(!col("kept")).collect().map(_.getLong(0)).toSet
    assert(uncapped.nonEmpty, "fixture must plant near pairs")
    assert(capped.subsetOf(uncapped),
      s"sub-splitting may only LOSE pairs: extra drops ${capped -- uncapped}")
    // 1200 ≡ 0 (mod nsub) for nsub ≤ 6, so planted pairs share slices
    assert(capped.nonEmpty, "same-slice planted pairs must still be dropped")
  }
}
