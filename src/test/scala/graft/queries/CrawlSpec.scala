package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed crawl front door (ds_crawl): stage consistency with
  * its standalone operators, both verdict branches exercised, and
  * the one-shuffle payload-carrying plan shape. */
class CrawlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("composite winners and fetch counts equal the standalone URL dedup") {
    val crawl = DataOps.dsCrawl(spark, sf)
      .select("canon_url", "doc_id", "n_fetches").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val standalone = DataOps.ddUrlDedup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(crawl == standalone,
      "the composite's keep-first stage must agree with dd_url_dedup")
  }

  test("extraction stage agrees with the standalone kernel on every winner") {
    val docs = graft.Tables(spark, sf, "documents")
    val ext = graft.operators.Html.extractMainText(
        docs.select(col("doc_id"),
          graft.operators.Html.syntheticPage(col("text"), col("source")).as("html")),
        col("html"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap // kept_blocks
    val crawl = DataOps.dsCrawl(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(crawl.nonEmpty)
    crawl.foreach { case (id, keptBlocks, nTok, verdict) =>
      assert(keptBlocks == ext(id), s"doc $id kept_blocks drifted")
      assert((verdict == "kept") == (nTok >= DataOps.crawlMinTokens))
    }
    // both branches of the thin-content gate occur on the corpus
    val verdicts = crawl.map(_._4).toSet
    assert(verdicts == Set("kept", "thin"),
      s"fixture should exercise both verdicts, got $verdicts")
  }

  test("the composite pays exactly one exchange (keep-first carries the payload)") {
    val plan = DataOps.dsCrawl(spark, sf).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"crawl composite should shuffle exactly once:\n$plan")
    assert(plan.contains("graft_html_extract"),
      s"extraction must be the kernel projection:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no join-back: the payload rides the min-struct:\n$plan")
  }
}
