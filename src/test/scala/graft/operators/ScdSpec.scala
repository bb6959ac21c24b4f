package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 invariants on a hand-built change log: intervals tile each
  * key's timeline with half-open [from, to) semantics, exactly one
  * current row per key, and a point-in-time probe returns exactly the
  * version in force at that instant. */
class ScdSpec extends SparkSpec {

  private def changeLog = {
    import spark.implicits._
    Seq(
      (1L, 100L, 1L, "bronze"),
      (1L, 200L, 2L, "silver"),
      (1L, 200L, 3L, "gold"),   // same-ts tie: event_id 3 wins the open interval
      (1L, 400L, 4L, "platinum"),
      (2L, 150L, 5L, "bronze")
    ).toDF("key", "ts", "eid", "state")
  }

  test("intervals tile the timeline; exactly one current row per key") {
    val dim = Scd.type2(changeLog, "key", "ts", "eid")
    val rows = dim.orderBy("key", "ts", "eid")
      .select("key", "state", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      (1L, "bronze", 100L, Some(200L), false),
      (1L, "silver", 200L, Some(200L), false), // zero-width: superseded in-tie
      (1L, "gold", 200L, Some(400L), false),
      (1L, "platinum", 400L, None, true),
      (2L, "bronze", 150L, None, true)))
    assert(rows.count(_._5) == 2, "one current row per key")
  }

  test("asOf returns exactly the version in force") {
    val dim = Scd.type2(changeLog, "key", "ts", "eid")
    def stateAt(t: Long): Map[Long, String] =
      Scd.asOf(dim, lit(t)).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[String]("state")).toMap
    assert(stateAt(199L) == Map(1L -> "bronze", 2L -> "bronze"))
    assert(stateAt(250L) == Map(1L -> "gold", 2L -> "bronze"))
    assert(stateAt(400L) == Map(1L -> "platinum", 2L -> "bronze"))
    assert(stateAt(50L) == Map.empty[Long, String])
  }
}
