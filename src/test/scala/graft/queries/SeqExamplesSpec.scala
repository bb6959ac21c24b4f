package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ev_seq_examples shaping laws on a hand-computed timeline. */
class SeqExamplesSpec extends SparkSpec {

  test("each post-warmup event yields one example with its true context") {
    import spark.implicits._
    // user 1: a b c d e f g (7 events) → 2 examples; user 2: 3 events → 0
    val types = Seq("a", "b", "c", "d", "e", "f", "g")
    val rows =
      types.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(1000L * (i + 1)), 1L, t) } ++
      Seq("x", "y", "z").zipWithIndex.map { case (t, i) =>
        (100L + i, new java.sql.Timestamp(1000L * (i + 1)), 2L, t) }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type")

    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val lags = (Events.seqCtx to 1 by -1).map(i => lag(col("event_type"), i).over(w))
    val out = ev
      .withColumn("input_seq", concat_ws(" ", lags: _*))
      .withColumn("full_ctx", lag(col("event_type"), Events.seqCtx).over(w).isNotNull)
      .filter(col("full_ctx"))
      .select(col("user_id"), col("event_id"), col("input_seq"),
        col("event_type").as("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._2)

    assert(out.length == 2, s"7 events, ctx 5 → 2 examples: ${out.toSeq}")
    assert(out(0) == (1L, 5L, "a b c d e", "f"))
    assert(out(1) == (1L, 6L, "b c d e f", "g"))
  }

  test("the registered query emits n - ctx examples per deep user") {
    val sf = "/root/testdata/sf0.001"
    val perUser = graft.Tables.eventsNanos(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = perUser.values.map(n => math.max(0L, n - Events.seqCtx)).sum
    assert(Events.evSeqExamples(spark, sf).count() == expected)
  }

  test("cohort retention counts distinct users on the (cohort, week) grid") {
    import spark.implicits._
    val wk = Events.weekUs
    // users 1,2 start week 0; user 1 returns week 1; user 3 starts week 1
    val rows = Seq(
      (1L, 1L, 0L), (2L, 2L, 1L), (3L, 1L, wk + 5L), (4L, 1L, wk + 9L),
      (5L, 3L, wk + 1L))
      .map { case (eid, u, us) =>
        (eid, new java.sql.Timestamp(us / 1000), u, "view") }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val e = df.withColumn("week", expr(s"(unix_micros(ts)) div $wk"))
    val cohort = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val out = e.select("user_id", "week").distinct()
      .join(cohort, "user_id")
      .groupBy("cohort_week", "week")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 1L) -> 1L), out)
  }

  test("temporal split: one test per user, at most one val, latest event is test") {
    val sf = "/root/testdata/sf0.001"
    val out = Events.evTemporalSplit(spark, sf)
    val byUser = out.groupBy("user_id").agg(
        sum(when(col("split") === "test", 1).otherwise(0)).as("t"),
        sum(when(col("split") === "val", 1).otherwise(0)).as("v"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    byUser.foreach { case (u, t, v, n) =>
      assert(t == 1L, s"user $u: exactly one test event")
      assert(v == (if (n >= 2) 1L else 0L), s"user $u: one val iff >= 2 events")
    }
    // the test event is the user's LATEST (tsu, event_id)
    val latest = graft.Tables.eventsNanos(spark, sf)
      .withColumn("tsu", expr("ts div 1000"))
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("tsu").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tests = out.filter(col("split") === "test")
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tests == latest)
  }
}
