package graft.operators

import graft.SparkSpec

/** As-of semantics: inclusive match at equal times, latest-preceding
  * otherwise, null when nothing precedes. */
class AsOfJoinSpec extends SparkSpec {

  test("left as-of picks latest right at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L), (4L, 20L, 50L))
      .toDF("event_id", "user_id", "tsu")
    val right = Seq((10L, 100L), (10L, 200L), (10L, 400L), (30L, 10L))
      .toDF("user_id", "err_ts")
    val out = AsOfJoin.leftAsOf(left, right, "user_id", "tsu", "err_ts", "err_ts", "m")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      1L -> Some(100L), // equal time matches (inclusive)
      2L -> Some(200L), // latest preceding, not the later 400
      3L -> Some(200L),
      4L -> None))      // no right rows for user 20
  }
}
