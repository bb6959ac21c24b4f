package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the event-time operators on crafted fixtures
  * (written as events.parquet with the harness schema — ts is raw
  * nanoseconds, exactly how the real table reads under nanosAsLong).
  */
class EventEdgeSpec extends SparkSpec {

  /** (event_id, ts_minutes, user_id, event_type, value) → events.parquet dir. */
  private def fixture(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev_fix").toString
    rows.map { case (id, min, uid, typ, v) =>
      (id, min * 60L * 1000000000L, uid, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel ignores clicks that precede the first view") {
    val dir = fixture(Seq(
      (1L, 0L, 1L, "click", 0.0),   // user 1: click BEFORE any view — must not count
      (2L, 5L, 1L, "view", 0.0),
      (3L, 9L, 1L, "click", 0.0),   // after the view → stage 2
      (4L, 0L, 2L, "click", 0.0)))  // user 2: click only, never views
    val got = Events.evFunnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> 1L, "2_click" -> 1L, "3_purchase" -> 0L))
  }

  test("resample forward-fills across multi-bucket gaps per user") {
    // user 1: values at hour 0 and hour 3 → buckets 1..2 carry 5.0
    val dir = fixture(Seq(
      (1L, 10L, 1L, "view", 5.0),
      (2L, 185L, 1L, "view", 7.0)))
    val got = Events.evResample(spark, dir).collect()
      .map(r => (r.getLong(1) / Events.resampleBucketUs) -> r.getDouble(2)).toMap
    assert(got == Map(0L -> 5.0, 1L -> 5.0, 2L -> 5.0, 3L -> 7.0))
  }

  test("latest-per-key takes the max (ts, event_id) record") {
    val dir = fixture(Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 10L, 1L, "click", 2.0),
      (3L, 10L, 1L, "error", 3.0))) // same minute as id 2 → id wins the tie
    val got = Events.evLatest(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 3L && r.getString(3) == "error" && r.getDouble(4) == 3.0)
  }
}
