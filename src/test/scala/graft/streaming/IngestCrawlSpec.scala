package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming crawl front door must enforce URL keep-first across
  * all three scopes (settled frontier, within-batch, earlier-batch
  * admissions), gate blocklisted domains and thin pages, and extract
  * main text identically to the batch kernel — with the per-batch
  * overwrite layout keeping retries idempotent. */
class IngestCrawlSpec extends SparkSpec {

  // a page whose main text is `n` prose tokens (one paragraph block)
  private def page(tag: String, n: Int): String =
    "<html><body><nav><a href=\"/\">home</a> <a href=\"/a\">a</a></nav><p>" +
      (1 to n).map(i => s"$tag$i").mkString(" ") +
      "</p><footer><a href=\"/l\">legal</a></footer></body></html>"

  test("URL keep-first across scopes + blocklist + thin gate + extraction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_crawl").toString

    val settled = Seq("http://old.com/seen").toDF("canon_url")
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"),
      Some(settled), dir, Seq("bad.com"))
    try {
      input.addData(
        // settled frontier hit (canonicalizes to http://old.com/seen)
        (1L, "HTTP://OLD.com/seen/?utm_source=x", page("a", 30)),
        // novel, kept — and the in-batch re-fetch below must lose
        (2L, "http://new.com/p1", page("b", 30)),
        (3L, "http://NEW.com:80/p1/", page("c", 30)),
        // blocked domain (dot-suffix)
        (4L, "http://ads.bad.com/x", page("d", 30)),
        // thin page: survives URL dedup, dies at the content gate
        (5L, "http://new.com/thin", page("e", 5)))
      q.processAllAvailable()
      input.addData(
        // cross-batch re-fetch of an ADMITTED url (tracking param +
        // default port variants of batch 1's winner) → dropped
        (20L, "HTTP://new.com:80/p1?utm_campaign=z", page("f", 30)),
        // novel in batch 2 → kept (https is a DISTINCT resource —
        // scheme is identity, only its default port normalizes away)
        (21L, "http://new.com/p2", page("g", 30)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(s"$dir/batch_*")
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(4))).toMap
    assert(rows.keySet == Set(2L, 21L),
      s"admitted = ${rows.keySet}: settled/in-batch/cross-batch dups, " +
        "blocked domains and thin pages must all be dropped")
    // extraction matches the batch kernel: nav/footer dropped, prose kept
    val (u2, text2, ntok2) = rows(2L)
    assert(u2 == "http://new.com/p1")
    assert(text2 == (1 to 30).map(i => s"b$i").mkString(" "))
    assert(ntok2 == 30L)
  }

  test("the frontier settles: O(1) scope paths and anti-joins still hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_crawl_settle").toString
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, dir, Nil,
      settleEvery = 2)
    try {
      input.addData((1L, "http://a.com/1", page("a", 30)),
        (2L, "http://a.com/2", page("b", 30)))
      q.processAllAvailable() // batch 0
      input.addData((3L, "http://a.com/3", page("c", 30)),
        (4L, "http://a.com/1", page("d", 30))) // re-fetch vs batch 0
      q.processAllAvailable() // batch 1
      input.addData((5L, "http://a.com/4", page("e", 30)))
      q.processAllAvailable() // batch 2: settles batches 0,1 → frontier_1
      // re-fetch of a FRONTIER url and of a live-delta url — the
      // settled layout must still reject both
      input.addData((6L, "http://a.com/2", page("f", 30)),
        (7L, "http://a.com/4", page("g", 30)),
        (8L, "http://a.com/5", page("h", 30)))
      q.processAllAvailable() // batch 3
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    assert(names == Set("frontier_1", "batch_2", "batch_3"),
      s"expected one settled frontier + tail deltas, got $names")
    // the next batch's admitted-state scope is O(settleEvery) paths,
    // not one per batch ever written
    assert(Frontier.scopePaths(spark, dir, 4L).get.size == 3)
    val admitted = Frontier.readLayered(spark, dir)
      .select("doc_id", "canon_url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(admitted == Map(1L -> "http://a.com/1", 2L -> "http://a.com/2",
      3L -> "http://a.com/3", 5L -> "http://a.com/4", 8L -> "http://a.com/5"),
      s"admitted = $admitted")
  }

  test("discovery sink: outbound links minus admitted/fetched, per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_crawl_disc").toString
    val disc = java.nio.file.Files.createTempDirectory("ingest_crawl_disc_d").toString
    // page 1 links to /next (novel) and to page 2's URL (fetched in
    // the same batch — excluded); page 3 in batch 2 links to page 1's
    // URL (admitted earlier — excluded) and to /next again
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, dir, Seq("bad.com"),
      discoveredDir = Some(disc))
    try {
      input.addData(
        (1L, "http://a.com/p1", pageWith("a",
          "<a href=\"/next\">n</a><a href=\"http://a.com/p2\">p2</a>" +
            "<a href=\"http://ads.bad.com/x\">ad</a><a href=\"#s\">s</a>")),
        (2L, "http://a.com/p2", pageWith("b", "")))
      q.processAllAvailable()
      input.addData(
        (3L, "http://a.com/p3", pageWith("c",
          "<a href=\"http://a.com/p1\">back</a><a href=\"/next\">n</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val d0 = spark.read.parquet(s"$disc/batch_0")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // novel /next discovered; same-batch p2, blocked ad and the
    // fragment self-link all excluded
    assert(d0 == Set(("http://a.com/next", "http://a.com/p1")), s"d0: $d0")
    val d1 = spark.read.parquet(s"$disc/batch_1")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // back-link to the ADMITTED p1 excluded; /next rediscovered (the
    // scheduler dedups the layered discovered set, not the batches)
    assert(d1 == Set(("http://a.com/next", "http://a.com/p3")), s"d1: $d1")
  }

  test("settled frontier probe is co-partitioned: zero exchange above the frontier scan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_crawl_bk").toString
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, dir, Nil,
      settleEvery = 2, frontierBuckets = 4)
    try {
      input.addData((1L, "http://a.com/1", page("a", 30)),
        (2L, "http://a.com/2", page("b", 30)))
      q.processAllAvailable() // batch 0
      input.addData((3L, "http://a.com/3", page("c", 30)))
      q.processAllAvailable() // batch 1
      input.addData((4L, "http://a.com/4", page("d", 30)))
      q.processAllAvailable() // batch 2: settles 0,1 → bucketed frontier_1
    } finally q.stop()
    val (front, _) = Frontier.scopeParts(spark, dir, 100L)
    val (m, path) = front.get
    assert(spark.catalog.tableExists(Frontier.tableName(dir, m)))
    // the per-batch probe shape: batch keys anti-joined against the
    // settled frontier — the frontier scan must satisfy the join's
    // distribution AND ordering from its bucketed+sorted layout
    val leftDir = java.nio.file.Files.createTempDirectory("ic_left").toString
    Seq("http://a.com/1", "http://a.com/9").toDF("canon_url")
      .write.mode("overwrite").parquet(leftDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = spark.read.parquet(leftDir).join(
        Frontier.frontierFrame(spark, dir, m, path).select("canon_url"),
        Seq("canon_url"), "left_anti")
      assert(probe.collect().map(_.getString(0)).toSeq == Seq("http://a.com/9"))
      // AQE prints Final + Initial sections; judge the executed one
      val p = probe.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin"), s"plan:\n$p")
      // exactly ONE exchange (the small batch side); the frontier
      // side reads its buckets co-partitioned — nothing above its
      // scan re-shuffles the admitted corpus
      assert(p.split("Exchange").length - 1 == 1, s"plan:\n$p")
      assert(p.contains("Bucketed: true"), s"plan:\n$p")
      // and only the batch side sorts: the frontier files are
      // bucket-sorted with one file per bucket
      assert(p.split("\\bSort \\[").length - 1 == 1, s"plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fetched ledger: a thin page's URL is never re-emitted as a candidate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_lg_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_lg_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_lg_f").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      // batch 0: a THIN page is fetched (gated, not admitted)
      input.addData((1L, "http://a.com/thin", page("a", 5)))
      q.processAllAvailable()
      // batch 1: a page links to the thin page and to a novel one
      input.addData((2L, "http://a.com/p", pageWith("b",
        "<a href=\"/thin\">t</a><a href=\"/next\">n</a>")))
      q.processAllAvailable()
    } finally q.stop()
    // the ledger recorded BOTH fetches with their verdicts
    val ledger = spark.read.parquet(s"$fetched/batch_*")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ledger == Map("http://a.com/thin" -> "thin",
      "http://a.com/p" -> "kept"), s"ledger: $ledger")
    // discovery scoped against FETCHED, not kept: /thin (fetched,
    // thin) is excluded; /next (never fetched) is emitted
    val d1 = spark.read.parquet(s"$disc/batch_1")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(d1 == Set(("http://a.com/next", "http://a.com/p")), s"d1: $d1")
    // and the loop closes: the next wave is the discovered-not-yet-
    // fetched set (the thin page's own nav links included — they ARE
    // fetch work), with the fetched pair excluded
    val wave = IngestCrawl.nextWave(spark, disc, fetched)
      .collect().map(_.getString(0)).toSet
    assert(wave.contains("http://a.com/next"), s"wave: $wave")
    assert(!wave.contains("http://a.com/thin") && !wave.contains("http://a.com/p"),
      s"fetched URLs must never re-enter a wave: $wave")
  }

  test("robots in the stream: a disallowed URL is never emitted nor scheduled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_rb_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_rb_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_rb_f").toString
    val rules = Seq(("a.com", "/private", false), ("a.com", "/*.pdf$", false))
      .toDF("host", "prefix", "allow")
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched),
      robotsRules = Some(rules))
    try {
      input.addData((1L, "http://a.com/p", pageWith("a",
        "<a href=\"/private/x\">p</a><a href=\"/doc.pdf\">d</a>" +
          "<a href=\"/ok\">o</a>")))
      q.processAllAvailable()
    } finally q.stop()
    // the disallowed prefix AND the wildcard rule both bite at
    // discovery: neither URL ever lands as a candidate
    val d0 = spark.read.parquet(s"$disc/batch_0")
      .collect().map(_.getString(0)).toSet
    assert(d0 == Set("http://a.com/ok"), s"discovered: $d0")
    // and the loop stays clean: the wave schedules only the survivor
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        robotsRules = Some(rules))
      .collect().map(_.getString(0)).toSet
    assert(wave == Set("http://a.com/ok"), s"wave: $wave")
  }

  test("per-agent robots compose into the stream: the chosen group's rules " +
      "replace the wildcard's at discovery and scheduling") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_ag_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_ag_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_ag_f").toString
    // one body, two readings: '*' disallows /ok; the specific group
    // REPLACES it (RFC 9309 §2.2.1) — disallowing /private instead
    val body = "User-agent: *\nDisallow: /ok\n\n" +
      "User-agent: graftbot-news\nDisallow: /private\n"
    val hosts = Seq(("a.com", body)).toDF("host", "body")
    val agentRules = graft.operators.Urls.robotsRules(
      hosts, col("host"), col("body"), agent = Some("graftbot-news"))
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched),
      robotsRules = Some(agentRules))
    try {
      input.addData((1L, "http://a.com/p", pageWith("a",
        "<a href=\"/private/x\">p</a><a href=\"/ok\">o</a>")))
      q.processAllAvailable()
    } finally q.stop()
    // the product token's group binds: /ok (wildcard-disallowed)
    // flows, /private (agent-disallowed) never lands
    val d0 = spark.read.parquet(s"$disc/batch_0")
      .collect().map(_.getString(0)).toSet
    assert(d0 == Set("http://a.com/ok"), s"discovered: $d0")
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        robotsRules = Some(agentRules))
      .collect().map(_.getString(0)).toSet
    assert(wave == Set("http://a.com/ok"), s"wave: $wave")
  }

  test("nextWave: trap gate drops flagged templates before the wave window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_tp_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_tp_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_tp_f").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      // a calendar trap (two digit-templated links) and a benign page
      input.addData((1L, "http://a.com/p", pageWith("a",
        "<a href=\"/cal?d=1\">c1</a><a href=\"/cal?d=2\">c2</a>" +
          "<a href=\"/ok\">o</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val traps = Seq(("a.com", "/cal?d=N")).toDF("host", "template")
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        traps = Some(traps))
      .collect().map(_.getString(0)).toSet
    assert(wave == Set("http://a.com/ok"), s"wave: $wave")
    // without the gate the calendar candidates would schedule
    val ungated = IngestCrawl.nextWave(spark, disc, fetched)
      .collect().map(_.getString(0)).toSet
    assert(ungated == Set("http://a.com/ok", "http://a.com/cal?d=1",
      "http://a.com/cal?d=2"), s"ungated: $ungated")
  }

  test("nextWave: OPIC cash receipts re-rank within a host, fallback to " +
      "in-link evidence for candidates without receipts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_op_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_op_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_op_f").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      // /a discovered twice (two referrer pages), /b once
      input.addData(
        (1L, "http://h.com/p1", pageWith("a",
          "<a href=\"/a\">a</a><a href=\"/b\">b</a>")),
        (2L, "http://h.com/p2", pageWith("b", "<a href=\"/a\">a</a>")))
      q.processAllAvailable()
    } finally q.stop()
    // without receipts: /a (2 refs) leads wave 0
    val plain = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(plain("http://h.com/a") == 0L && plain("http://h.com/b") == 1L,
      s"plain: $plain")
    // cash inverts the order; /a (no receipt) falls back to its refs
    val cash = Seq(("http://h.com/b", 500L)).toDF("url", "cash")
    val ranked = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1, priority = Some(cash))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ranked("http://h.com/b") == 0L && ranked("http://h.com/a") == 1L,
      s"ranked: $ranked")
  }

  test("nextWave: scheduling-time robots refilter + per-host delay caps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_nw_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_nw_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_nw_f").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    // the stream runs WITHOUT robots (rules arrived later — the
    // refresh-between-discovery-and-schedule case)
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      input.addData((1L, "http://a.com/p", pageWith("a",
        (1 to 5).map(i => s"<a href=\"/w$i\">w</a>").mkString +
          "<a href=\"http://b.com/x1\">b</a><a href=\"http://b.com/x2\">b</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val rules = Seq(("a.com", "/w5", false)).toDF("host", "prefix", "allow")
    val caps = Seq(("a.com", 2L)).toDF("host", "cap")
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1, robotsRules = Some(rules), hostCaps = Some(caps))
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // /w5 was DISCOVERED rules-less, but scheduling refilters it out
    assert(!wave.exists(_._1 == "http://a.com/w5"), s"wave: $wave")
    // per-host per-wave multiplicity == that host's delay-derived cap
    // (default for capless hosts), waves dense from 0
    val byHostWave = wave.groupBy(t => (t._2, t._4)).view.mapValues(_.size)
    byHostWave.foreach { case ((h, w), n) =>
      val cap = if (h == "a.com") 2 else 1
      assert(n <= cap, s"wave $w overfull for $h: $n > $cap")
    }
    val aWaves = wave.filter(_._2 == "a.com").map(_._4).toSet
    val bWaves = wave.filter(_._2 == "b.com").map(_._4).toSet
    assert(aWaves == Set(0L, 1L), s"a.com waves: $aWaves") // 4 urls / cap 2
    assert(bWaves == Set(0L, 1L), s"b.com waves: $bWaves") // 2 urls / cap 1
    assert(wave.filter(_._2 == "a.com").forall(_._3 == 2L))
    assert(wave.filter(_._2 == "b.com").forall(_._3 == 1L))
  }

  test("nextWave: sitemap seeds join at zero evidence through the same " +
      "fetched scope and robots gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_sd_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_sd_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_sd_f").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      input.addData((1L, "http://a.com/p", pageWith("a",
        "<a href=\"/w1\">w</a><a href=\"/w2\">w</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val seeds = Seq(
      "http://a.com/w1",        // also discovered → keeps evidence 1
      "http://a.com/new1",      // sitemap-only → enters at evidence 0
      "http://a.com/p",         // already fetched → excluded
      "http://a.com/private/x") // robots-blocked → excluded
      .toDF("url")
    val rules = Seq(("a.com", "/private", false)).toDF("host", "prefix", "allow")
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        robotsRules = Some(rules), seeds = Some(seeds))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wave.keySet == Set("http://a.com/w1", "http://a.com/w2",
      "http://a.com/new1"), s"wave: $wave")
    assert(wave("http://a.com/new1") == 0L,
      "a sitemap-only seed enters at zero in-link evidence")
    assert(wave("http://a.com/w1") == 1L,
      "a seed that is also discovered keeps its discovery evidence")
  }

  test("hostQuality gate: a host that turns low-quality stops being " +
      "scheduled; evidence-less hosts stay schedulable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_hq_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_hq_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_hq_f").toString
    def richPage(links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"w$i").mkString(" ") + "</p></div></body></html>"
    val thinPage = "<html><body><div><p>tiny</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    // settle every batch so the gate's refresh-at-settle path runs
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      settleEvery = 1, discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      // batch 0: host a is healthy (2 kept pages, links to more)
      input.addData(
        (1L, "http://a.com/p1", richPage("<a href=\"/n1\">n</a>")),
        (2L, "http://a.com/p2", richPage("<a href=\"/n2\">n</a>")))
      q.processAllAvailable()
      val hq0 = IngestCrawl.hostQuality(spark, fetched, keepPct = 60)
        .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
      assert(hq0 == Map("a.com" -> true), s"hq0: $hq0")
      val wave0 = IngestCrawl.nextWave(spark, disc, fetched,
          hostQuality = Some(IngestCrawl.hostQuality(spark, fetched, 60)))
        .collect().map(_.getString(0)).toSet
      assert(wave0 == Set("http://a.com/n1", "http://a.com/n2"),
        s"wave0: $wave0")
      // batch 1: host a turns into a thin-content farm (3 thin
      // fetches flip its keep rate under 60%); host b arrives healthy
      input.addData(
        (3L, "http://a.com/t1", thinPage), (4L, "http://a.com/t2", thinPage),
        (5L, "http://a.com/t3", thinPage),
        (6L, "http://b.com/p1", richPage("<a href=\"/m1\">m</a>" +
          "<a href=\"http://c.com/x\">c</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val hq = IngestCrawl.hostQuality(spark, fetched, keepPct = 60)
    val verdicts = hq.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // a: 5 pages, 2 kept → condemned; b: 1/1 → ok
    assert(verdicts("a.com") == ((5L, 2L, false)), s"verdicts: $verdicts")
    assert(verdicts("b.com") == ((1L, 1L, true)), s"verdicts: $verdicts")
    val wave1 = IngestCrawl.nextWave(spark, disc, fetched,
        hostQuality = Some(hq))
      .collect().map(_.getString(0)).toSet
    // a's still-unfetched candidates are GONE; b's discovery is
    // scheduled; c.com (no fetch evidence) stays schedulable
    assert(wave1 == Set("http://b.com/m1", "http://c.com/x"),
      s"wave1: $wave1")
  }

  test("sitemapSeeds: an index child is fetched as a sitemap, never " +
      "scheduled as a page") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, concat}
    // host a serves a <sitemapindex> at its root (any site past the
    // protocol's 50k-URL cap does); host b a flat <urlset>
    val bodies = Seq(
      ("a.com",
        """<?xml version="1.0"?>
          |<sitemapindex>
          |<sitemap><loc>https://a.com/pages-1.xml</loc></sitemap>
          |<sitemap><loc>
          |  HTTPS://WWW.A.COM:443/pages-2.xml
          |</loc></sitemap>
          |</sitemapindex>""".stripMargin),
      ("b.com",
        """<?xml version="1.0"?>
          |<urlset>
          |<url><loc>https://b.com/p1</loc></url>
          |<url><loc>https://b.com/p2?x=1&amp;y=2</loc></url>
          |</urlset>""".stripMargin))
      .toDF("host", "xml")
    val (pages, children) = IngestCrawl.sitemapSeeds(
      bodies, col("host"), col("xml"))
    val pageSet = pages.collect().map(_.getString(0)).toSet
    val childSet = children.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // the index children are in the sitemap-fetch scope, canonical
    assert(childSet == Set(("a.com", "https://a.com/pages-1.xml"),
      ("a.com", "https://a.com/pages-2.xml")), s"children: $childSet")
    // and NOT in the page-seed frame; the urlset locs are
    assert(pageSet == Set("https://b.com/p1", "https://b.com/p2?x=1&y=2"),
      s"pages: $pageSet")
    // close the loop: fetching a child body as a sitemap yields ITS
    // pages as seeds on the next level
    val childBody = Seq(("a.com",
      "<urlset><url><loc>https://a.com/deep/1</loc></url></urlset>"))
      .toDF("host", "xml")
    val (deepPages, deepChildren) = IngestCrawl.sitemapSeeds(
      childBody, col("host"), col("xml"))
    assert(deepChildren.isEmpty)
    assert(deepPages.collect().map(_.getString(0)).toSet ==
      Set("https://a.com/deep/1"))
    // and the page half schedules through nextWave with NO index
    // child ever entering the page frontier
    val disc = java.nio.file.Files.createTempDirectory("ic_si_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_si_f").toString
    Seq(("https://b.com/p1", "https://b.com/ref"))
      .toDF("url", "referrer")
      .write.parquet(s"$disc/batch_0")
    spark.createDataFrame(Seq.empty[(String, String)])
      .toDF("canon_url", "verdict").write.parquet(s"$fetched/batch_0")
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        seeds = Some(pages))
      .collect().map(_.getString(0)).toSet
    assert(wave == Set("https://b.com/p1", "https://b.com/p2?x=1&y=2"),
      s"wave: $wave")
    assert(!wave.exists(_.endsWith(".xml")),
      "no sitemap file may be scheduled as a page fetch")
  }

  test("recrawl: change evidence accrues in the ledger, due URLs re-enter " +
      "the wave and re-admit as new versions, not-due URLs stay excluded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_rc_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_rc_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_rc_f").toString
    val hot = "http://a.com/hot"
    val cold = "http://a.com/cold"
    val input = MemoryStream[(Long, String, String)]
    // run 1: first fetches land change-evidence rows (n_fetches=1,
    // n_changes=0, b=0 -> explore interval 8)
    val q1 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      input.addData((1L, hot, page("a", 30)), (2L, cold, page("c", 30)))
      q1.processAllAvailable()
    } finally q1.stop()
    // due-ness follows the ladder: nothing due before the explore
    // interval elapses, everything due after
    assert(IngestCrawl.recrawlDue(spark, fetched, 3L).count() == 0)
    val due8 = IngestCrawl.recrawlDue(spark, fetched, 8L)
    assert(due8.collect().map(_.getString(0)).toSet == Set(hot, cold))
    val dueHot = due8.filter(col("canon_url") === hot)
    // a due URL re-enters the wave past the fetched exclusion; the
    // not-due one stays out
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        recrawl = Some(dueHot))
      .collect().map(_.getString(0)).toSet
    assert(wave.contains(hot) && !wave.contains(cold), s"wave: $wave")
    // run 2, recrawl scope = the due set: batch 0 replays identically
    // (same offsets), then refetches land — hot (changed payload)
    // re-admits as a new version and increments the transition count;
    // cold is NOT in scope, so its refetch is dropped and its ledger
    // row stays untouched. settleEvery=1 exercises the cumulative
    // counters surviving the latest-wins fold.
    val q2 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      settleEvery = 1, discoveredDir = Some(disc),
      fetchedDir = Some(fetched), recrawlScope = Some(dueHot))
    try {
      q2.processAllAvailable() // replay of batch 0
      input.addData((10L, hot, page("x", 30)), (11L, cold, page("c", 30)))
      q2.processAllAvailable() // batch 1
      input.addData((20L, hot, page("y", 30)))
      q2.processAllAvailable() // batch 2: prev state spans frontier+delta
    } finally q2.stop()
    val state = IngestCrawl.recrawlDue(spark, fetched, 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // hot: 3 processed fetches, 2 observed transitions, last at batch
    // 2, hottest rung; cold: untouched since batch 0, explore rung
    assert(state(hot) == (3L, 2L, 2L, 1L), s"hot state: ${state(hot)}")
    assert(state(cold) == (1L, 0L, 0L, 8L), s"cold state: ${state(cold)}")
    // the corpus carries hot's versions (latest-wins at each settle),
    // and cold was admitted exactly once
    val admitted = graft.streaming.Frontier.readLayered(spark, surv)
      .select("canon_url", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(admitted.contains((hot, 20L)), s"newest hot version: $admitted")
    assert(admitted.filter(_._1 == cold).map(_._2) == Set(2L),
      s"cold must keep its single first fetch: $admitted")
  }

  test("OPIC cash persists across settles: receipts accumulate, a " +
      "distributing page's balance resets, and accumulated cash " +
      "re-ranks a host's wave order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_cs_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_cs_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_cs_f").toString
    val cash = java.nio.file.Files.createTempDirectory("ic_cs_c").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    def junk(prefix: String): String =
      (0 until 5).map(i => s"<a href=\"/$prefix$i\">j</a>").mkString
    val input = MemoryStream[(Long, String, String)]
    // settleEvery=1: every batch folds — accumulation must survive
    // multiple settles, the law the one-round recompute fails
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      settleEvery = 1, discoveredDir = Some(disc),
      fetchedDir = Some(fetched), cashDir = Some(cash), opicInit = 1200L)
    try {
      // batch 0: p1 links ONLY /a → /a receives 1200 (outdeg 1)
      input.addData((1L, "http://h.com/p1",
        pageWith("a", "<a href=\"/a\">a</a>")))
      q.processAllAvailable()
      // batches 1, 2 (≥2 settles later): p2 and p3 each link /b plus
      // 5 junk links (outdeg 6 → /b receives 200 from each)
      input.addData((2L, "http://h.com/p2",
        pageWith("b", "<a href=\"/b\">b</a>" + junk("j"))))
      q.processAllAvailable()
      input.addData((3L, "http://h.com/p3",
        pageWith("c", "<a href=\"/b\">b</a>" + junk("k"))))
      q.processAllAvailable()
      // in-link evidence now ranks /b (2 refs) over /a (1 ref), but
      // accumulated cash ranks /a (1200) over /b (400)
      val receipts = IngestCrawl.cashReceipts(spark, cash)
      val m = receipts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m("http://h.com/a") == 1200L && m("http://h.com/b") == 400L,
        s"accumulated receipts across settles: $m")
      val plain = IngestCrawl.nextWave(spark, disc, fetched,
          perHostPerWave = 1)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(plain("http://h.com/b") < plain("http://h.com/a"),
        s"refs rank /b first: $plain")
      val ranked = IngestCrawl.nextWave(spark, disc, fetched,
          perHostPerWave = 1, priority = Some(receipts))
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(ranked("http://h.com/a") < ranked("http://h.com/b"),
        s"accumulated cash re-ranks /a first: $ranked")
      // batch 3: /a itself is fetched, linking only /z — it
      // distributes its initial 1200 PLUS its accumulated 1200, and
      // its own balance resets: cash moves, it is never re-spent
      input.addData((4L, "http://h.com/a",
        pageWith("z", "<a href=\"/z\">z</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val after = IngestCrawl.cashReceipts(spark, cash)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("http://h.com/z") == 2400L,
      s"the fetched page's accumulated cash moved to its outlink: $after")
    assert(after("http://h.com/a") == 0L,
      s"the distributing page's balance reset: $after")
    assert(after("http://h.com/b") == 400L, s"untouched balances keep: $after")
  }

  test("redirect aliasing: admission keys on the final URL, alias " +
      "sources land in the ledger and never re-schedule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_rd_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_rd_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_rd_f").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "final_url", "html"),
      None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      // p1 links to the redirect source, its target, and a novel URL;
      // TWO requests 301 onto the same final /dest — one admission
      input.addData(
        (1L, "http://h.com/p1", "",
          pageWith("a", "<a href=\"/old/dest\">o</a><a href=\"/dest\">d</a>" +
            "<a href=\"/new\">n</a>")),
        (2L, "http://h.com/old/dest", "http://h.com/dest", pageWith("b", "")),
        (3L, "http://h.com/old/old/dest", "http://h.com/dest",
          pageWith("c", "")))
      q.processAllAvailable()
      // a later re-fetch of the alias source: the final URL is
      // already admitted, so no new version; the alias row's change
      // evidence accrues (same target → no observed change)
      input.addData(
        (10L, "http://h.com/old/dest", "http://h.com/dest", pageWith("d", "")))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.read.parquet(s"$surv/batch_*")
      .select("canon_url", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // /dest admitted ONCE under the FINAL url (min doc_id 2 wins);
    // the requested /old/ keys never become corpus keys
    assert(admitted == Set(("http://h.com/p1", 1L), ("http://h.com/dest", 2L)),
      s"admitted: $admitted")
    val ledger = spark.read.parquet(s"$fetched/batch_*")
      .groupBy("canon_url")
      .agg(max(struct(col("b"), col("verdict"), col("n_fetches"),
        col("n_changes"))).as("w"))
      .select(col("canon_url"), col("w.verdict"), col("w.n_fetches"),
        col("w.n_changes"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ledger("http://h.com/old/dest") == (("alias", 2L, 0L)),
      s"alias source refetched once, target unchanged: $ledger")
    assert(ledger("http://h.com/old/old/dest") == (("alias", 1L, 0L)),
      s"ledger: $ledger")
    assert(ledger("http://h.com/dest")._1 == "kept", s"ledger: $ledger")
    // discovery emitted ONLY the novel link: the fetched target and
    // the alias source are both excluded
    val discovered = spark.read.parquet(s"$disc/batch_*")
      .select("url").collect().map(_.getString(0)).toSet
    assert(discovered == Set("http://h.com/new"), s"discovered: $discovered")
    // and the next wave schedules only it — an aliased target never
    // re-schedules
    val wave = IngestCrawl.nextWave(spark, disc, fetched)
      .collect().map(_.getString(0)).toSet
    assert(wave == Set("http://h.com/new"), s"wave: $wave")
    // alias rows never count against host quality
    val hq = IngestCrawl.hostQuality(spark, fetched, keepPct = 60)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3))))
      .toMap
    assert(hq("h.com") == ((2L, true)), s"hostQuality counts pages only: $hq")
  }

  test("recrawlDue: a fresh sitemap lastmod overrides the ladder rung; " +
      "stale or never-fetched announcements change nothing") {
    import spark.implicits._
    val fetched = java.nio.file.Files.createTempDirectory("ic_lm").toString
    // static.com/x: confirmed static (2 fetches, 0 changes → rung 64)
    // other.com/y: same rung, no announcement
    Seq(("http://static.com/x", "kept", 2L, 0L, 0L, 0L),
      ("http://other.com/y", "kept", 2L, 0L, 0L, 0L))
      .toDF("canon_url", "verdict", "n_fetches", "n_changes", "n_unmod", "b")
      .withColumn("n_fail", lit(0L))
      .withColumn("h", md5(col("canon_url").cast("binary")))
      .write.parquet(s"$fetched/batch_0")
    // ladder alone: nothing due at batch 5 (64-wave rung)
    assert(IngestCrawl.recrawlDue(spark, fetched, 5L).count() == 0)
    val ann = Seq(
      ("http://static.com/x", 3L),  // announced AFTER the b=0 fetch
      ("http://static.com/x", 2L),  // duplicate listing — must fold
      ("http://other.com/y", 0L),   // stale: not after the fetch
      ("http://never.com/z", 4L))   // never fetched: a seed, not a recrawl
      .toDF("canon_url", "lastmod_batch")
    val due = IngestCrawl.recrawlDue(spark, fetched, 5L, Some(ann))
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(due == Map("http://static.com/x" -> true),
      s"only the freshly-announced static URL is due: $due")
    // and the ladder path still reports sitemap_due = false
    val due64 = IngestCrawl.recrawlDue(spark, fetched, 64L, Some(ann))
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(due64 == Map("http://static.com/x" -> true,
      "http://other.com/y" -> false), s"due64: $due64")
  }

  test("hostQuality folds the ledger to the latest row per URL: each " +
      "URL votes its newest verdict once, across settle boundaries") {
    import spark.implicits._
    val fetched = java.nio.file.Files.createTempDirectory("ic_hqf").toString
    def ledgerRows(rows: Seq[(String, String, Long, Long, Long)], b: Long)
        : Unit =
      rows.toDF("canon_url", "verdict", "n_fetches", "n_changes", "b")
        .withColumn("h", md5(col("canon_url").cast("binary")))
        .write.parquet(s"$fetched/batch_$b")
    // batch 0: p1 kept, p2 kept; batch 1: p1 REFETCHED as thin (its
    // newest verdict) — live deltas, no settle
    ledgerRows(Seq(("http://a.com/p1", "kept", 1L, 0L, 0L),
      ("http://a.com/p2", "kept", 1L, 0L, 0L)), 0L)
    ledgerRows(Seq(("http://a.com/p1", "thin", 2L, 1L, 1L)), 1L)
    val hq = IngestCrawl.hostQuality(spark, fetched, keepPct = 60)
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // unfolded, the host would read 3 pages / 2 kept (67% → ok);
    // folded to latest-per-URL it is 2 pages / 1 kept (50% → gone) —
    // the same verdict a post-settle read would produce
    assert(hq("a.com") == ((2L, 1L, false)), s"hq: $hq")
  }

  test("ledger reads fail fast on the pre-change-evidence row format") {
    import spark.implicits._
    val fetched = java.nio.file.Files.createTempDirectory("ic_lgc").toString
    Seq(("http://a.com/x", "kept")).toDF("canon_url", "verdict")
      .write.parquet(s"$fetched/batch_0")
    val e = intercept[IllegalStateException] {
      IngestCrawl.recrawlDue(spark, fetched, 10L).collect()
    }
    assert(e.getMessage.contains("pre-r17"), e.getMessage)
    assert(e.getMessage.contains("n_changes"), e.getMessage)
  }

  test("nextWave tolerates duplicate urls in the priority frame: " +
      "candidates never duplicate, wave density holds") {
    import spark.implicits._
    val disc = java.nio.file.Files.createTempDirectory("ic_pd_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_pd_f").toString
    Seq(("http://h.com/a", "http://h.com/p1"),
      ("http://h.com/b", "http://h.com/p1"))
      .toDF("url", "referrer").write.parquet(s"$disc/batch_0")
    // a caller's un-grouped receipts frame lists /b twice
    val cash = Seq(("http://h.com/b", 500L), ("http://h.com/b", 300L))
      .toDF("url", "cash")
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1, priority = Some(cash))
      .collect().map(r => r.getString(0) -> r.getLong(3))
    assert(wave.length == 2, s"each candidate exactly once: ${wave.toSeq}")
    val m = wave.toMap
    // /b ranks first on max(cash)=500; /a falls back to in-link refs
    assert(m("http://h.com/b") == 0L && m("http://h.com/a") == 1L,
      s"wave: $m")
  }

  test("everything on at once: redirects + cash + ledger + discovery " +
      "compose — each gate keeps its law in the full loop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_all_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_all_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_all_f").toString
    val cash = java.nio.file.Files.createTempDirectory("ic_all_c").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "final_url", "html"),
      None, surv, Nil, settleEvery = 1,
      discoveredDir = Some(disc), fetchedDir = Some(fetched),
      cashDir = Some(cash), opicInit = 1200L)
    try {
      // p1 links the redirect source and a novel URL; the redirect
      // request r2 lands on /dest whose content links /n2
      input.addData(
        (1L, "http://h.com/p1", "",
          pageWith("a", "<a href=\"/old/dest\">o</a><a href=\"/n1\">n</a>")),
        (2L, "http://h.com/old/dest", "http://h.com/dest",
          pageWith("b", "<a href=\"/n2\">m</a>")))
      q.processAllAvailable()
      input.addData(
        (3L, "http://h.com/p2", "", pageWith("c", "<a href=\"/n1\">n</a>")))
      q.processAllAvailable()
    } finally q.stop()
    // admission keyed on finals; ledger carries the alias row (read
    // LAYERED: settleEvery=1 folds the per-batch delta dirs away)
    val ledger = Frontier.readLayered(spark, fetched)
      .groupBy("canon_url").agg(max(struct(col("b"), col("verdict"))).as("w"))
      .select(col("canon_url"), col("w.verdict").as("verdict"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ledger("http://h.com/old/dest") == "alias" &&
      ledger("http://h.com/dest") == "kept", s"ledger: $ledger")
    // discovery excluded the alias source and the fetched target
    val discovered = Frontier.readLayered(spark, disc)
      .select("url").collect().map(_.getString(0)).toSet
    assert(discovered == Set("http://h.com/n1", "http://h.com/n2"),
      s"discovered: $discovered")
    // cash accumulated across settles: p1's 1200 split over its 2
    // links (600 each: the alias source keeps parked cash, inert by
    // the ledger exclusion); /dest's page gave /n2 1200; p2 gave /n1
    // another 1200 → 1800
    val receipts = IngestCrawl.cashReceipts(spark, cash)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(receipts("http://h.com/n1") == 1800L, s"receipts: $receipts")
    assert(receipts("http://h.com/n2") == 1200L, s"receipts: $receipts")
    assert(receipts("http://h.com/old/dest") == 600L,
      s"parked alias cash stays inert: $receipts")
    // the wave ranks on accumulated cash and never schedules the
    // alias source or fetched content
    val wave = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1, priority = Some(receipts.toSeq
          .toDF("url", "cash")))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(wave.keySet == Set("http://h.com/n1", "http://h.com/n2"),
      s"wave: $wave")
    assert(wave("http://h.com/n1") < wave("http://h.com/n2"), s"wave: $wave")
  }

  test("dir-backed recrawl snapshot: the due scope is pinned on disk at " +
      "wave-plan time and survives ledger rewrites and a mid-stream restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_snap_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_snap_f").toString
    val snap = java.nio.file.Files.createTempDirectory("ic_snap_p").toString
    val hot = "http://a.com/hot"
    val cold = "http://a.com/cold"
    val input = MemoryStream[(Long, String, String)]
    val q1 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      fetchedDir = Some(fetched))
    try {
      input.addData((1L, hot, page("a", 30)), (2L, cold, page("c", 30)))
      q1.processAllAvailable()
    } finally q1.stop()
    // the due scope is a live PLAN over the fetched ledger — exactly
    // the frame a deployment hands; the snapshot must decouple it
    // from the ledger rewrites the stream itself performs
    val dueHot = IngestCrawl.recrawlDue(spark, fetched, 8L)
      .filter(col("canon_url") === hot)
    val q2 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      settleEvery = 1, fetchedDir = Some(fetched),
      recrawlScope = Some(dueHot), recrawlSnapshotDir = Some(snap))
    try {
      q2.processAllAvailable() // replay of batch 0 against the snapshot
      input.addData((10L, hot, page("x", 30)), (11L, cold, page("c", 30)))
      q2.processAllAvailable() // ledger rewritten + settled (every=1)
      input.addData((20L, hot, page("y", 30)))
      q2.processAllAvailable()
    } finally q2.stop()
    // restart-surviving by construction: q2's FIRST batch was itself
    // a replay (q1 already consumed those offsets) probing the
    // snapshot, and after three ledger folds (settleEvery=1) the
    // snapshot still reads back the exact pinned set — a restarted
    // driver re-pins from these bytes, no live ledger plan involved
    assert(spark.read.parquet(snap).as[String].collect().toSet == Set(hot),
      "the snapshot holds exactly the pinned due set")
    val state = IngestCrawl.recrawlDue(spark, fetched, 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // identical outcome to the driver-pinned path: hot re-admitted
    // per the scope, cold's refetch dropped (not in scope)
    assert(state(hot) == ((3L, 2L)), s"hot state: ${state(hot)}")
    assert(state(cold) == ((1L, 0L)), s"cold state: ${state(cold)}")
    val admitted = Frontier.readLayered(spark, surv)
      .select("canon_url", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(admitted.contains((hot, 20L)), s"newest hot version: $admitted")
    assert(admitted.filter(_._1 == cold).map(_._2) == Set(2L),
      s"cold keeps its single first fetch: $admitted")
  }

  test("OPIC cash is conserved: a distributing page keeps its " +
      "floor-division remainder, so total system cash never drains") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_cons_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_cons_f").toString
    val cash = java.nio.file.Files.createTempDirectory("ic_cons_c").toString
    def pageWith(tag: String, links: String): String =
      "<html><body><div>" + links + "<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      settleEvery = 1, fetchedDir = Some(fetched), cashDir = Some(cash),
      opicInit = 1000L)
    try {
      // batch 0: p distributes 1000 over 3 links → 333 each, keeps 1
      input.addData((1L, "http://h.com/p", pageWith("a",
        "<a href=\"/a\">a</a><a href=\"/b\">b</a><a href=\"/c\">c</a>")))
      q.processAllAvailable()
      // batch 1: /a (holding 333) distributes 1000+333 over 2 links
      // → 666 each, keeps 1333 % 2 = 1
      input.addData((2L, "http://h.com/a", pageWith("b",
        "<a href=\"/d\">d</a><a href=\"/e\">e</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val m = IngestCrawl.cashReceipts(spark, cash)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("http://h.com/p") == 1L,
      s"the first distributor keeps 1000 % 3: $m")
    assert(m("http://h.com/a") == 1L,
      s"the refetched page keeps (1000 + 333) % 2: $m")
    assert(m("http://h.com/b") == 333L && m("http://h.com/c") == 333L &&
      m("http://h.com/d") == 666L && m("http://h.com/e") == 666L,
      s"receipts: $m")
    // conservation: every fetch injected exactly opicInit, nothing
    // drained — the pre-r19 reset lost the remainders (1 + 1 here)
    assert(m.values.sum == 2000L, s"total cash = 2 fetches × 1000: $m")
  }

  test("same-batch content + alias duplicate resolves by policy: the " +
      "content row wins, so change evidence never flips on replay order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_dup_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_dup_f").toString
    def pageWith(tag: String): String =
      "<html><body><div><p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val x = "http://h.com/x"
    val input = MemoryStream[(Long, String, String, String)]
    // x in the recrawl scope so the batch-1 refetch re-enters
    // admission and lands change evidence against batch 0's row
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "final_url", "html"),
      None, surv, Nil, fetchedDir = Some(fetched),
      recrawlScope = Some(Seq(x).toDF("canon_url")))
    try {
      // ONE batch observes /x twice: serving content (row 1) AND as
      // the source of a redirect onto /y (row 2). Policy: the content
      // observation wins the ledger row.
      input.addData(
        (1L, x, "", pageWith("a")),
        (2L, x, "http://h.com/y", pageWith("b")))
      q.processAllAvailable()
      // refetch /x with the identical payload: with the content hash
      // pinned, this is NO observed change; had the alias row's
      // h = md5(target url) survived, this would spuriously count one
      input.addData((10L, x, "", pageWith("a")))
      q.processAllAvailable()
    } finally q.stop()
    val ledger = spark.read.parquet(s"$fetched/batch_*")
      .groupBy("canon_url")
      .agg(max(struct(col("b"), col("verdict"), col("n_fetches"),
        col("n_changes"))).as("w"))
      .select(col("canon_url"), col("w.verdict"), col("w.n_fetches"),
        col("w.n_changes"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ledger(x) == (("kept", 2L, 0L)),
      s"content wins the same-batch fold; identical refetch counts no " +
        s"change: $ledger")
    assert(ledger("http://h.com/y")._1 == "kept", s"ledger: $ledger")
  }

  test("rel=canonical in the stream: admission keys on the declared " +
      "canonical, declarers become alias sources and never re-schedule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_cn_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_cn_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_cn_f").toString
    def pageOf(tag: String, head: String, links: String): String =
      s"<html><head>$head</head><body><div>$links<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      // the article and its ?page=2 twin that DECLARES it canonical
      // (relative href — the resolve path); one batch, one admission
      input.addData(
        (1L, "http://h.com/article", pageOf("a", "", "")),
        (2L, "http://h.com/article?page=2", pageOf("b",
          "<link rel=\"canonical\" href=\"/article\"/>",
          "<a href=\"/n1\">n</a>")))
      q.processAllAvailable()
      // a page declaring an absolute canonical onto UNcrawled content
      // admits under the DECLARED key, not its fetch URL
      input.addData(
        (3L, "http://h.com/other", pageOf("c",
          "<link href=\"http://h.com/fresh\" rel=\"canonical\"/>", "")))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = Frontier.readLayered(spark, surv)
      .select("canon_url", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(admitted == Set(("http://h.com/article", 1L),
        ("http://h.com/fresh", 3L)),
      s"one admission per canonical, keyed on the declaration: $admitted")
    val ledger = Frontier.readLayered(spark, fetched)
      .select("canon_url", "verdict").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ledger("http://h.com/article?page=2") == "alias" &&
      ledger("http://h.com/other") == "alias", s"ledger: $ledger")
    // discovery: the twin's outlink /n1 flows from the ADMITTED page
    // (the article won the fold, so its content — linkless — decides;
    // the alias source's links ride only if its content was admitted)
    val wave = IngestCrawl.nextWave(spark, disc, fetched)
      .collect().map(_.getString(0)).toSet
    assert(!wave.contains("http://h.com/article?page=2") &&
      !wave.contains("http://h.com/other") &&
      !wave.contains("http://h.com/article"),
      s"no alias source or fetched content re-schedules: $wave")
  }

  test("not_modified: a validated batch writes no survivor rows, bumps " +
      "n_fetches and the unchanged streak only, and the streak demotes " +
      "the recrawl ladder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_nm_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_nm_f").toString
    val u = "http://a.com/u"
    val input = MemoryStream[(Long, String, String, Boolean)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html", "not_modified"),
      None, surv, Nil, settleEvery = 1, fetchedDir = Some(fetched),
      recrawlScope = Some(Seq(u).toDF("canon_url")))
    try {
      input.addData((1L, u, page("a", 30), false))
      q.processAllAvailable() // first fetch: (kept, 1, 0, streak 0)
      input.addData((2L, u, page("b", 30), false))
      q.processAllAvailable() // observed change: (2, 1, streak 0)
      input.addData((3L, u, page("b", 30), false))
      q.processAllAvailable() // identical refetch: (3, 1, streak 1)
      input.addData((4L, u, "", true))
      q.processAllAvailable() // validated unchanged: (4, 1, streak 2)
    } finally q.stop()
    val led = Frontier.readLayered(spark, fetched)
      .groupBy("canon_url")
      .agg(max(struct(col("b"), col("verdict"), col("n_fetches"),
        col("n_changes"), col("n_unmod"), col("h"))).as("w"))
      .select("w.verdict", "w.n_fetches", "w.n_changes", "w.n_unmod", "w.h")
      .collect()
    assert(led.length == 1)
    val r = led(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (("not_modified", 4L, 1L, 2L)),
      s"verdict/n_fetches/n_changes/n_unmod: ${r.mkString(",")}")
    assert(r.getString(4) != null,
      "the validated row carries the previous payload hash forward")
    // no survivor row landed for the validated fetch — the corpus
    // (folded latest-per-URL by the settles) keeps batch 2's copy as
    // its newest version, never a doc-4 row
    val admitted = Frontier.readLayered(spark, surv)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(3L),
      s"a not_modified fetch must never admit: $admitted")
    // ladder demotion: rung 4 (one observed change) backed off by the
    // streak of 2 → effective 16 — not due when the bare rung would
    // be, due once the demoted interval elapses
    val at7 = IngestCrawl.recrawlDue(spark, fetched, 7L).count()
    assert(at7 == 0, "streak-demoted URL must not be due at the bare rung")
    val at19 = IngestCrawl.recrawlDue(spark, fetched, 19L)
      .select("interval_waves").collect().map(_.getLong(0))
    assert(at19.toSeq == Seq(16L),
      s"effective interval = 4 * 2^2: ${at19.toSeq}")
  }

  test("meta robots in the stream: a noindex page never admits but its " +
      "links flow, a nofollow page contributes no candidates, and " +
      "neither compliance verdict votes host quality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_mr_s").toString
    val disc = java.nio.file.Files.createTempDirectory("ic_mr_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_mr_f").toString
    def pageOf(tag: String, head: String, links: String): String =
      s"<html><head>$head</head><body><div>$links<p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      discoveredDir = Some(disc), fetchedDir = Some(fetched))
    try {
      input.addData(
        (1L, "http://h.com/p1", pageOf("a",
          "<meta name=\"robots\" content=\"noindex\"/>",
          "<a href=\"/n1\">n</a>")),
        (2L, "http://h.com/p2", pageOf("b",
          "<meta content=\"nofollow\" name=\"robots\"/>",
          "<a href=\"/n2\">n</a>")),
        (3L, "http://h.com/p3", pageOf("c", "", "<a href=\"/n3\">n</a>")))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = Frontier.readLayered(spark, surv)
      .select("canon_url").collect().map(_.getString(0)).toSet
    assert(admitted == Set("http://h.com/p2", "http://h.com/p3"),
      s"noindex never admits: $admitted")
    val ledger = Frontier.readLayered(spark, fetched)
      .select("canon_url", "verdict").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ledger("http://h.com/p1") == "noindex", s"ledger: $ledger")
    val discovered = Frontier.readLayered(spark, disc)
      .select("url").collect().map(_.getString(0)).toSet
    assert(discovered == Set("http://h.com/n1", "http://h.com/n3"),
      s"noindex links flow, nofollow links do not: $discovered")
    // the noindex page is in the fetched scope: never re-scheduled
    val wave = IngestCrawl.nextWave(spark, disc, fetched)
      .collect().map(_.getString(0)).toSet
    assert(!wave.contains("http://h.com/p1"), s"wave: $wave")
    // compliance verdicts don't vote quality: 2 content pages, both
    // kept → 100% ≥ 80; counting noindex as not-kept would read 67%
    val hq = IngestCrawl.hostQuality(spark, fetched, keepPct = 80)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3))))
      .toMap
    assert(hq("h.com") == ((2L, true)),
      s"noindex must not vote host quality: $hq")
  }

  test("cash-aware due refetches: a high-cash due URL outranks a " +
      "zero-evidence discovery within its host; without receipts the " +
      "due URL falls back to evidence 0") {
    import spark.implicits._
    val disc = java.nio.file.Files.createTempDirectory("ic_cd_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_cd_f").toString
    // one discovered candidate with in-link evidence 1, one DUE
    // refetch of an already-fetched high-cash page, same host
    Seq(("http://h.com/new", "http://h.com/ref"))
      .toDF("url", "referrer").write.parquet(s"$disc/batch_0")
    Seq(("http://h.com/hot", "kept", 2L, 2L, 1L, 0L))
      .toDF("canon_url", "verdict", "n_fetches", "n_changes", "n_unmod", "b")
      .withColumn("n_fail", lit(0L))
      .withColumn("h", md5(col("canon_url").cast("binary")))
      .write.parquet(s"$fetched/batch_0")
    val due = IngestCrawl.recrawlDue(spark, fetched, 10L)
    assert(due.count() == 1, "the hot-rung URL must be due")
    // without receipts: the due refetch joins at evidence 0 and the
    // discovered link outranks it
    val plain = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1, recrawl = Some(due))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(plain("http://h.com/new") < plain("http://h.com/hot"),
      s"evidence ranks the discovery first: $plain")
    // with accumulated OPIC receipts: the due page's cash outranks
    // the zero-cash discovery — freshness work on proven-important
    // pages schedules ahead of speculative discovery
    val receipts = Seq(("http://h.com/hot", 5000L)).toDF("url", "cash")
    val ranked = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 1, recrawl = Some(due), priority = Some(receipts))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ranked("http://h.com/hot") < ranked("http://h.com/new"),
      s"cash re-ranks the due refetch first: $ranked")
  }

  test("noindex gained on refetch: the ledger verdict flips and the old " +
      "survivor copy drops at the next settle (tombstone compaction)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_nif_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_nif_f").toString
    val flip = "http://a.com/flip"
    val keep = "http://a.com/keep"
    def pageOf(tag: String, head: String): String =
      s"<html><head>$head</head><body><div><p>" +
        (1 to 30).map(i => s"$tag$i").mkString(" ") + "</p></div></body></html>"
    val input = MemoryStream[(Long, String, String)]
    // run 1: both pages admit as kept
    val q1 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      fetchedDir = Some(fetched))
    try {
      input.addData((1L, flip, pageOf("a", "")), (2L, keep, pageOf("b", "")))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(Frontier.readLayered(spark, surv)
      .select("canon_url").collect().map(_.getString(0)).toSet ==
      Set(flip, keep))
    // run 2, both due: flip's refetch now declares noindex — the
    // ledger verdict flips and a tombstone supersedes the retained
    // copy; keep's refetch stays kept. settleEvery=1 so the batch
    // after the refetch folds the tombstone into the frontier.
    val due = IngestCrawl.recrawlDue(spark, fetched, 8L)
    assert(due.collect().map(_.getString(0)).toSet == Set(flip, keep))
    val q2 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html"), None, surv, Nil,
      settleEvery = 1, fetchedDir = Some(fetched), recrawlScope = Some(due))
    try {
      q2.processAllAvailable() // replay of batch 0
      input.addData(
        (10L, flip, pageOf("a",
          "<meta name=\"robots\" content=\"noindex\"/>")),
        (11L, keep, pageOf("b2", "")))
      q2.processAllAvailable() // batch 1: tombstone + new keep version
      input.addData((20L, "http://a.com/other", pageOf("c", "")))
      q2.processAllAvailable() // batch 2: settles batch 1's tombstone
    } finally q2.stop()
    // ledger: flip's NEWEST verdict is noindex (it flipped), and the
    // refetch still counted as change evidence
    val ledger = spark.read.parquet(s"$fetched/frontier_*", s"$fetched/batch_*")
      .groupBy("canon_url")
      .agg(max(struct(col("b"), col("verdict"))).as("w"))
      .select(col("canon_url"), col("w.verdict"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ledger(flip) == "noindex", s"ledger must flip: $ledger")
    assert(ledger(keep) == "kept", s"ledger: $ledger")
    // survivors: the settled frontier no longer carries flip at all —
    // not the old copy (erased by the tombstone), not the marker
    val settled = spark.read.parquet(s"$surv/frontier_*")
      .select("canon_url").collect().map(_.getString(0))
    assert(!settled.contains(flip),
      s"flip's retained copy must drop at the settle: ${settled.toSet}")
    // the layered consumer view agrees, and keep is at its newest copy
    val live = Frontier.readLayered(spark, surv)
      .select("canon_url", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!live.exists(_._1 == flip), s"live view: $live")
    assert(live.contains((keep, 11L)), s"keep's newest version: $live")
  }

  test("migrateLedger: a pre-r19 ledger dir gains the missing " +
      "change-evidence columns with conservative defaults, idempotently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ic_mig").toString
    // an r16-shaped delta (verdict only) and an r18-shaped frontier
    // (everything but n_unmod), exactly the formats the fail-fast names
    Seq(("http://a.com/x", "kept"), ("http://a.com/y", "thin"))
      .toDF("canon_url", "verdict")
      .write.parquet(s"$dir/batch_3")
    Seq(("http://a.com/z", "kept", "h0", 4L, 2L, 2L))
      .toDF("canon_url", "verdict", "h", "n_fetches", "n_changes", "b")
      .write.parquet(s"$dir/frontier_2")
    // pre-migration: the stream refuses the old format loudly
    val err = intercept[IllegalStateException] {
      IngestCrawl.recrawlDue(spark, dir, 10L).collect()
    }
    assert(err.getMessage.contains("row format"), err.getMessage)
    IngestCrawl.migrateLedger(spark, dir)
    val rows = IngestCrawl.recrawlDue(spark, dir, 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // migrated defaults: n_fetches=1, n_changes=0, b=<dir id>; the
    // r18 frontier keeps its real evidence and gains only n_unmod=0
    assert(rows("http://a.com/x") == ((1L, 0L, 3L)), s"rows: $rows")
    assert(rows("http://a.com/z") == ((4L, 2L, 2L)), s"rows: $rows")
    val cols = spark.read.parquet(s"$dir/batch_3").columns.toSet
    assert(Set("canon_url", "verdict", "h", "n_fetches", "n_changes",
      "n_unmod", "b").subsetOf(cols), s"cols: $cols")
    // idempotent: a second run rewrites nothing (same file listing)
    def listing() = {
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/batch_3"))
        .map(s => s.getPath.getName -> s.getModificationTime).toSeq.sortBy(_._1)
    }
    val before = listing()
    IngestCrawl.migrateLedger(spark, dir)
    assert(listing() == before, "second migration must be a no-op")
  }

  test("bytes at the stream boundary: a mixed-encoding byte stream " +
      "decoded through the charset door admits identically to the " +
      "pre-decoded string stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Charset
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    // one page per encoding posture; urls distinct so all admit
    val pages = (0 to 4).map { v =>
      val page = Charset.syntheticEncodedPage(v, text)
      val bytes = v match {
        case 0 => page.getBytes("UTF-8")
        case 1 => Array(0xff.toByte, 0xfe.toByte) ++ page.getBytes("UTF-16LE")
        case 2 => page.getBytes("ISO-8859-1")
        case 3 => page.getBytes("windows-1252")
        case _ => page.getBytes("ISO-8859-1")
      }
      (v.toLong, page, bytes, s"http://enc.com/p$v")
    }
    def admitted(dir: String): Map[String, String] =
      spark.read.parquet(s"$dir/batch_*")
        .select("canon_url", "main_text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // string stream: the pages as already-decoded html
    val sDir = java.nio.file.Files.createTempDirectory("ic_enc_s").toString
    val sIn = MemoryStream[(Long, String, String)]
    val q1 = IngestCrawl.crawledIngest(
      sIn.toDF().toDF("doc_id", "url", "html"), None, sDir, Nil)
    try {
      sIn.addData(pages.map(p => (p._1, p._4, p._2)))
      q1.processAllAvailable()
    } finally q1.stop()
    // byte stream: raw payloads, the charset door spliced in front —
    // the composition a byte-fed deployment runs
    val bDir = java.nio.file.Files.createTempDirectory("ic_enc_b").toString
    val bIn = MemoryStream[(Long, Array[Byte], String)]
    val decoded = Charset.decodedTagged(
        bIn.toDF().toDF("doc_id", "payload", "url"),
        col("payload"), col("doc_id"), col("url"))
      .select(col("doc_id"), col("tag").as("url"), col("text").as("html"))
    val q2 = IngestCrawl.crawledIngest(decoded, None, bDir, Nil)
    try {
      bIn.addData(pages.map(p => (p._1, p._3, p._4)))
      q2.processAllAvailable()
    } finally q2.stop()
    val a = admitted(sDir)
    val b = admitted(bDir)
    assert(a == b, s"byte path must equal string path:\n$a\nvs\n$b")
    assert(a.size == 5 && a.values.forall(_.contains("café")),
      s"all five encodings must admit with the marker intact: $a")
  }

  test("transient failures: error verdicts never admit, the n_fail " +
      "streak backs retryDue off exponentially, and a success resets " +
      "the URL into the freshness ladder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_err_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_err_f").toString
    val ok = "http://a.com/ok"
    val err = "http://a.com/flaky"
    val gone = "http://a.com/nope"
    def ledger(): Map[String, (String, Long, Long, Long)] =
      Frontier.readLayered(spark, fetched)
        .groupBy("canon_url")
        .agg(max(struct(col("b"), col("verdict"), col("n_fetches"),
          col("n_fail"))).as("w"))
        .collect().map(r => r.getString(0) -> ((r.getStruct(1).getString(1),
          r.getStruct(1).getLong(2), r.getStruct(1).getLong(3),
          r.getStruct(1).getLong(0)))).toMap
    val input = MemoryStream[(Long, String, String, Int)]
    val q = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html", "http_status"),
      None, surv, Nil, fetchedDir = Some(fetched))
    try {
      input.addData((1L, ok, page("a", 30), 200),
        (2L, err, "", 500), (3L, gone, "", 404))
      q.processAllAvailable() // batch 0
      // only the 200 admits; the failures land evidence, not content
      val admitted0 = spark.read.parquet(s"$surv/batch_*")
        .filter(!col("tombstone"))
        .select("canon_url").collect().map(_.getString(0)).toSet
      assert(admitted0 == Set(ok), s"$admitted0")
      val l0 = ledger()
      assert(l0(ok) == (("kept", 1L, 0L, 0L)), s"$l0")
      assert(l0(err) == (("error", 0L, 1L, 0L)),
        s"a failed attempt is not a content fetch: $l0")
      assert(l0(gone) == (("gone", 1L, 0L, 0L)), s"$l0")
      // scheduling split: the freshness ladder owns ok only; retryDue
      // owns the error once its first backoff (1 wave) elapses; gone
      // belongs to neither — permanently
      val recrawl = IngestCrawl.recrawlDue(spark, fetched, 100L)
        .collect().map(_.getString(0)).toSet
      assert(recrawl == Set(ok), s"recrawl owns content only: $recrawl")
      assert(IngestCrawl.retryDue(spark, fetched, 0L).count() == 0)
      val retry1 = IngestCrawl.retryDue(spark, fetched, 1L)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
      assert(retry1.toSeq == Seq((err, 1L, 1L)), s"$retry1")
      // second failure doubles the wait: due at b+2, not b+1
      input.addData((10L, err, "", 503))
      q.processAllAvailable() // batch 1
      val l1 = ledger()
      assert(l1(err) == (("error", 0L, 2L, 1L)), s"streak grows: $l1")
      assert(IngestCrawl.retryDue(spark, fetched, 2L).count() == 0,
        "backoff 2: not due one wave after the second failure")
      assert(IngestCrawl.retryDue(spark, fetched, 3L).count() == 1)
      // past the attempt cap the URL is dropped for good
      assert(IngestCrawl.retryDue(spark, fetched, 3L, maxAttempts = 1)
        .count() == 0, "maxAttempts caps the ladder")
      // recovery: a 200 resets the streak and returns the URL to the
      // freshness ladder (explore rung — its first CONTENT fetch)
      input.addData((20L, err, page("z", 30), 200))
      q.processAllAvailable() // batch 2
      val l2 = ledger()
      assert(l2(err) == (("kept", 1L, 0L, 2L)), s"success resets: $l2")
      assert(IngestCrawl.retryDue(spark, fetched, 100L).count() == 0)
      assert(IngestCrawl.recrawlDue(spark, fetched, 100L)
        .collect().map(_.getString(0)).toSet == Set(ok, err))
    } finally q.stop()
  }

  test("gone on refetch: the ledger flips, the retained copy drops at " +
      "the settle, and the recovery change-count reads the last REAL " +
      "copy through an error interlude") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val surv = java.nio.file.Files.createTempDirectory("ic_gn_s").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_gn_f").toString
    val dead = "http://a.com/dead"
    val flaky = "http://a.com/wobble"
    val input = MemoryStream[(Long, String, String, Int)]
    // run 1: both pages admit as kept
    val q1 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html", "http_status"),
      None, surv, Nil, fetchedDir = Some(fetched))
    try {
      input.addData((1L, dead, page("a", 30), 200),
        (2L, flaky, page("b", 30), 200))
      q1.processAllAvailable()
    } finally q1.stop()
    val h0 = Frontier.readLayered(spark, fetched)
      .filter(col("canon_url") === flaky)
      .select("h").collect().head.getString(0)
    // run 2, both due: dead 410s (erase), flaky 500s (hash CARRIED)
    val due = IngestCrawl.recrawlDue(spark, fetched, 8L)
    val q2 = IngestCrawl.crawledIngest(
      input.toDF().toDF("doc_id", "url", "html", "http_status"),
      None, surv, Nil, settleEvery = 1, fetchedDir = Some(fetched),
      recrawlScope = Some(due))
    try {
      q2.processAllAvailable() // replay of batch 0
      input.addData((10L, dead, "", 410), (11L, flaky, "", 500))
      q2.processAllAvailable() // batch 1: tombstone + carried-hash error
      input.addData((20L, "http://a.com/other", page("c", 30), 200))
      q2.processAllAvailable() // batch 2: settles batch 1's tombstone
      val st = Frontier.readLayered(spark, fetched)
        .groupBy("canon_url")
        .agg(max(struct(col("b"), col("verdict"), col("h"),
          col("n_changes"))).as("w"))
        .collect().map(r => r.getString(0) -> ((r.getStruct(1).getString(1),
          Option(r.getStruct(1).getString(2)), r.getStruct(1).getLong(3))))
        .toMap
      assert(st(dead)._1 == "gone" && st(dead)._2.isEmpty, s"$st")
      assert(st(flaky) == (("error", Some(h0), 0L)),
        s"the error row must carry the last real hash: $st")
      // dead's retained copy is gone from the settled corpus
      val live = Frontier.readLayered(spark, surv)
        .select("canon_url").collect().map(_.getString(0)).toSet
      assert(!live.contains(dead), s"410 must erase the copy: $live")
      assert(live.contains(flaky),
        "a transient error must NOT erase the retained copy")
      // recovery with CHANGED content counts exactly one transition —
      // against the pre-error copy, not against the error interlude
      input.addData((30L, flaky, page("b2", 30), 200))
      q2.processAllAvailable() // batch 3
    } finally q2.stop()
    val rec = Frontier.readLayered(spark, fetched)
      .filter(col("canon_url") === flaky)
      .groupBy("canon_url")
      .agg(max(struct(col("b"), col("verdict"), col("n_changes"),
        col("n_fail"))).as("w"))
      .collect().map(r => (r.getStruct(1).getString(1),
        r.getStruct(1).getLong(2), r.getStruct(1).getLong(3))).head
    assert(rec == (("kept", 1L, 0L)),
      s"one real transition through the interlude: $rec")
  }

  test("nextWave honors ipGroups: vanity hosts on one server share a " +
      "wave budget, with and without a caps frame") {
    import spark.implicits._
    val disc = java.nio.file.Files.createTempDirectory("ic_ipg_d").toString
    val fetched = java.nio.file.Files.createTempDirectory("ic_ipg_f").toString
    // four candidates across two vanity hosts of one server
    (1 to 2).flatMap(i => Seq(
        (s"http://v1.srv.com/p$i", "http://x.com/r"),
        (s"http://v2.srv.com/p$i", "http://x.com/r")))
      .toDF("url", "referrer").write.parquet(s"$disc/batch_0")
    spark.createDataFrame(Seq.empty[(String, String)])
      .toDF("canon_url", "verdict").write.parquet(s"$fetched/batch_0")
    val groups = Seq(("v1.srv.com", "srv"), ("v2.srv.com", "srv"))
      .toDF("host", "ip_group")
    // capless path: perHostPerWave=2 becomes the GROUP budget — four
    // urls over one shared queue → waves {0,0,1,1}, never {0,0,0,0}
    val capless = IngestCrawl.nextWave(spark, disc, fetched,
        perHostPerWave = 2, ipGroups = Some(groups))
      .collect().map(r => r.getLong(r.length - 1))
    assert(capless.sorted.toSeq == Seq(0L, 0L, 1L, 1L),
      s"shared budget: ${capless.toSeq}")
    // capped path: the strictest member cap (1) governs the group
    val caps = Seq(("v1.srv.com", 4L), ("v2.srv.com", 1L))
      .toDF("host", "cap")
    val capped = IngestCrawl.nextWave(spark, disc, fetched,
        hostCaps = Some(caps), ipGroups = Some(groups))
      .collect().map(r => r.getLong(r.length - 1))
    assert(capped.sorted.toSeq == Seq(0L, 1L, 2L, 3L),
      s"min member cap drains one per wave: ${capped.toSeq}")
  }

  test("per-batch overwrite keeps reprocessing idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ingest_crawl_idem").toString
    val input = MemoryStream[(Long, String, String)]
    def run(): Unit = {
      val q = IngestCrawl.crawledIngest(
        input.toDF().toDF("doc_id", "url", "html"), None, dir, Nil)
      try { q.processAllAvailable() } finally q.stop()
    }
    input.addData((1L, "http://a.com/x", page("a", 25)))
    run()
    val first = spark.read.parquet(s"$dir/batch_*").collect().toSeq
    // a retry of the same offsets replays batch 0: the overwrite
    // layout must land the identical state, not a duplicate
    run()
    val second = spark.read.parquet(s"$dir/batch_*").collect().toSeq
    assert(first.map(_.getLong(0)) == second.map(_.getLong(0)))
    assert(second.size == 1)
  }
}
