package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench stdout artifact must survive the driver's bounded
  * tail capture at ANY query count: under the 1900-char budget and
  * JSON-parseable at every degradation tier (2dp → 1dp → map
  * dropped). Seven rounds of `parsed: null` rode on this line.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def synth(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%03d_operator_name", 0.123 * (i % 40) + 0.05))

  test("the real query inventory keeps a per-query map under budget") {
    // realistic r8-shaped timings: mostly sub-second, a few heavies
    val results = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
      .map { case (n, i) => (n, if (i % 13 == 0) 12.3 else 0.2 + (i % 9) * 0.3) }
    val line = Bench.renderStdoutLine(results, "sf0.1")
    assert(line.length <= 1900, s"len=${line.length}")
    val node = mapper.readTree(line)
    assert(node.has("queries"),
      s"per-query map must survive at ${results.size} queries (len=${line.length})")
    val q = node.get("queries")
    // the heavies (the entries a round-over-round regression check
    // actually reads) are always present
    results.filter(_._2 >= 5.0).foreach { case (k, _) =>
      assert(q.has(k), s"slow query $k missing from the map")
    }
    // the map is a slowness-prefix: nothing may be dropped while a
    // FASTER entry is kept — dropped queries are always the cheapest,
    // readable from BENCH_FULL.json instead
    val kept = results.filter { case (k, _) => q.has(k) }
    val dropped = results.filterNot { case (k, _) => q.has(k) }
    if (dropped.nonEmpty) {
      val minKept = kept.map(_._2).min
      dropped.foreach { case (k, v) =>
        assert(v <= minKept, s"$k ($v s) dropped while a faster entry is kept")
      }
      // a partial map declares the true inventory size
      assert(node.get("nqueries").asInt() == results.size)
    }
  }

  test("partial tier keeps the slowest entries and the true count") {
    // names wide enough that a full map cannot fit the budget
    val rs = (1 to 150).map(i => (f"q$i%03d_very_long_operator_name_pad", i * 0.1))
    val line = Bench.renderStdoutLine(rs, "sf0.1")
    assert(line.length <= 1900, s"len=${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("nqueries").asInt() == 150)
    val q = node.get("queries")
    assert(q.size() > 10 && q.size() < 150)
    // retained = exactly the K slowest
    val keptNames = (1 to 150).map(i => f"q$i%03d_very_long_operator_name_pad")
      .filter(q.has(_)).toSet
    val slowest = rs.sortBy(-_._2).take(q.size()).map(_._1).toSet
    assert(keptNames == slowest)
  }

  test("120 synthetic queries: under budget and parseable") {
    val line = Bench.renderStdoutLine(synth(120), "sf0.1")
    assert(line.length <= 1900, s"len=${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("value").asDouble() > 0)
    assert(node.get("sf").asText() == "sf0.1")
    if (node.has("nqueries")) assert(node.get("nqueries").asInt() == 120)
    else assert(node.get("queries").size() == 120)
  }

  test("total matches the sum of successful entries at map precision") {
    val rs = synth(40)
    val node = mapper.readTree(Bench.renderStdoutLine(rs, "sf0.01"))
    val sum = {
      val q = node.get("queries")
      rs.map { case (k, _) => q.get(k).asDouble() }.sum
    }
    // per-entry rounding only — never a precision-mismatch gap
    assert(math.abs(node.get("value").asDouble() - sum) <= 0.005 * rs.size)
  }

  test("failures stay visible through every degradation tier") {
    val rs = synth(200).updated(3, ("q004_operator_name", -1.0))
    Seq(1900, 700, 120).foreach { budget =>
      val node = mapper.readTree(Bench.renderStdoutLine(rs, "sf0.1", budget))
      assert(node.get("errors").get(0).asText() == "q004_operator_name",
        s"errors lost at budget $budget")
      // -1 sentinels are excluded from the total
      assert(node.get("value").asDouble() >= 0)
    }
    // the last-resort tier really is short, whatever the query count
    val line = Bench.renderStdoutLine(rs, "sf0.1", 120)
    assert(!mapper.readTree(line).has("queries"))
    assert(mapper.readTree(line).get("nqueries").asInt() == 200)
  }
}
