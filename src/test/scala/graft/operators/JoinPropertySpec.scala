package graft.operators

import graft.SparkSpec

/** Randomized property checks for the time-series joins against
  * trivially-correct in-memory oracles (seeded → deterministic). */
class JoinPropertySpec extends SparkSpec {

  private val rng = new scala.util.Random(99)

  test("property: leftAsOf equals the brute-force latest-preceding lookup") {
    import spark.implicits._
    for (_ <- 1 to 10) {
      val lefts = (0 until 80).map(i =>
        (i.toLong, rng.nextInt(5).toLong, rng.nextLong(1000)))
      val rights = (0 until 40).map(_ =>
        (rng.nextInt(5).toLong, rng.nextLong(1000), rng.nextLong(100)))
      val lf = lefts.toDF("event_id", "user_id", "tsu")
      val rf = rights.toDF("user_id", "rt", "payload")
      val got = AsOfJoin.leftAsOf(lf, rf, "user_id", "tsu", "rt", "payload", "m")
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val expected = lefts.map { case (id, u, t) =>
        // oracle: payload of the max-rt right row with rt <= t; ties on
        // rt resolved by the later-unioned row (same as last() scan
        // order) — make rt unique per user to avoid tie ambiguity
        val cands = rights.filter(r => r._1 == u && r._2 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._2, rights.indexOf(r)))._3))
      }.toMap
      // only compare keys where the rt is unique (tie order is
      // engine-internal); with random 0..999 longs duplicates are rare
      val dupRts = rights.groupBy(r => (r._1, r._2)).filter(_._2.size > 1).keySet
      val safe = lefts.filter { case (_, u, t) =>
        !rights.exists(r => dupRts.contains((r._1, r._2)) && r._1 == u && r._2 <= t)
      }.map(_._1).toSet
      safe.foreach(id => assert(got(id) == expected(id), s"event $id"))
    }
  }

  test("property: salted joins (full and hot-key-only) equal the plain join on skewed data") {
    import spark.implicits._
    for (_ <- 1 to 5) {
      // one pathological key (0) carrying ~80% of the fact rows
      val fact = (0 until 200).map { i =>
        val k = if (rng.nextInt(5) < 4) 0L else 1L + rng.nextInt(10)
        (k, i.toLong)
      }
      val build = (0L to 10L).map(k => (k, s"p$k"))
      val ff = fact.toDF("k", "row_id")
      val bf = build.toDF("k", "payload")
      val plain = ff.join(bf, Seq("k")).select("k", "row_id", "payload")
        .collect().map(_.toSeq).toSet
      val full = SkewedJoin.saltedInner(ff, bf, "k", 4)
        .select("k", "row_id", "payload").collect().map(_.toSeq).toSet
      val hotOnly = SkewedJoin.saltedInnerHot(ff, bf, "k", 4, hotThreshold = 50L)
        .select("k", "row_id", "payload").collect().map(_.toSeq).toSet
      assert(full == plain)
      assert(hotOnly == plain)
    }
  }

  test("property: binned range join equals the brute-force containment join") {
    import spark.implicits._
    for (_ <- 1 to 10) {
      val points = (0 until 60).map(i =>
        (i.toLong, rng.nextInt(4).toLong, rng.nextLong(10000)))
      val ivals = (0 until 20).map { j =>
        val s = rng.nextLong(9000)
        (100L + j, rng.nextInt(4).toLong, s, s + rng.nextLong(2000))
      }
      val pf = points.toDF("pid", "k", "t")
      val vf = ivals.toDF("iid", "k", "s", "e")
      val got = RangeJoin.binned(pf, vf, "k", "t", "s", "e", binWidth = 500L)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (pid, pk, t) <- points
        (iid, ik, s, e) <- ivals
        if pk == ik && t >= s && t <= e
      } yield (pid, iid)).toSet
      assert(got == expected)
    }
  }
}
