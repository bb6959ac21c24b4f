package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed crawl front door (ds_crawl): stage consistency with
  * its standalone operators, both verdict branches exercised, and
  * the one-shuffle payload-carrying plan shape. */
class CrawlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("composite winners and fetch counts equal the standalone URL dedup") {
    val crawl = Crawl.dsCrawl(spark, sf)
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
    val crawl = Crawl.dsCrawl(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(crawl.nonEmpty)
    crawl.foreach { case (id, keptBlocks, nTok, verdict) =>
      assert(keptBlocks == ext(id), s"doc $id kept_blocks drifted")
      assert((verdict == "kept") == (nTok >= Crawl.crawlMinTokens))
    }
    // both branches of the thin-content gate occur on the corpus
    val verdicts = crawl.map(_._4).toSet
    assert(verdicts == Set("kept", "thin"),
      s"fixture should exercise both verdicts, got $verdicts")
  }

  test("the composite pays exactly one exchange (keep-first carries the payload)") {
    val plan = Crawl.dsCrawl(spark, sf).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"crawl composite should shuffle exactly once:\n$plan")
    assert(plan.contains("graft_html_extract"),
      s"extraction must be the kernel projection:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no join-back: the payload rides the min-struct:\n$plan")
  }

  test("dsCrawlPolite composes its stages: robots-kept URLs, capped dense waves") {
    val polite = Crawl.dsCrawlPolite(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val robotsKept = Crawl.dsCrawlRobots(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(polite.map(_._1).toSet == robotsKept,
      "the composite must schedule exactly the robots-kept frontier")
    // the delay caps bind per host, waves dense from 0
    polite.groupBy(_._2).foreach { case (host, g) =>
      val cap = g.head._3
      assert(g.forall(_._3 == cap), s"host $host: mixed caps")
      val byWave = g.groupBy(_._4).view.mapValues(_.size)
      byWave.foreach { case (w, n) =>
        assert(n <= cap, s"host $host wave $w overfull: $n > $cap")
      }
      val waves = byWave.keySet
      assert(waves == (0L until waves.size.toLong).toSet,
        s"host $host waves not dense: $waves")
    }
  }

  test("dsCrawlPolite stages the frontier ONCE: the scheduled plan reads a " +
      "materialized frame, never the canon cascade") {
    val qe = Crawl.dsCrawlPolite(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // the frontier (link explode + resolve + canonicalize) lives
    // behind GraftBridge.stageLocal — were it inlined, the robots
    // verdict branch and its keep anti-join would each replay the
    // cascade; the staged plan shows the kernel exactly zero times
    assert(!plan.contains("graft_url_pct"),
      s"canon cascade leaked into the scheduled plan:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"expected the staged frontier's LogicalRDD scan:\n$plan")
  }

  test("dsHostQuality: gate identity per host, stats reconcile with verdicts") {
    val crawl = Crawl.dsCrawl(spark, sf)
      .select("canon_url", "n_tokens", "verdict").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val byHost = crawl.groupBy(t =>
      t._1.replaceAll("^[a-z][a-z0-9+.-]*://", "").takeWhile(c =>
        c != '/' && c != '?' && c != '#' && c != ':'))
    val hq = Crawl.dsHostQuality(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(hq.keySet == byHost.keySet, s"${hq.keySet} vs ${byHost.keySet}")
    byHost.foreach { case (host, rows) =>
      val (nPages, nKept, sumTok, ok) = hq(host)
      assert(nPages == rows.size.toLong, s"$host pages")
      assert(nKept == rows.count(_._3 == "kept").toLong, s"$host kept")
      assert(sumTok == rows.map(_._2).sum, s"$host tokens")
      // the gate IS the integer identity — no float rate anywhere
      assert(ok == (2 * nKept >= nPages), s"$host gate identity")
    }
  }

  test("dsCrawlWaves invariants hold and reconcile with the schedule") {
    val waves = Crawl.dsCrawlWaves(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
        r.getBoolean(7)))
    assert(waves.nonEmpty)
    waves.foreach { case (host, cap, nUrls, nWaves, maxWave, maxPer, dense, capped) =>
      assert(dense && capped, s"host $host: dense=$dense capped=$capped")
      assert(maxWave == nWaves - 1 && maxPer <= cap)
      // the histogram reconciles: rank-div-cap fills every wave but
      // possibly the last completely
      assert(nUrls > (nWaves - 1) * cap && nUrls <= nWaves * cap,
        s"host $host: $nUrls urls cannot fill $nWaves waves at cap $cap")
    }
    assert(waves.map(_._3).sum == Crawl.dsCrawlDelay(spark, sf).count())
  }

  test("dsFrontierOpic: covers the frontier with >= its evidence, floor " +
      "shares shrink with hub outdegree, blocked hosts never receive cash") {
    val opic = Crawl.dsFrontierOpic(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val frontier = Crawl.dsCrawlFrontier(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every frontier candidate receives cash, with in-link evidence at
    // least the frontier's (hub links can only add)
    frontier.foreach { case (url, nRefs) =>
      assert(opic.contains(url), s"frontier url $url missing from opic")
      assert(opic(url)._1 >= nRefs, s"$url lost evidence")
      assert(opic(url)._2 > 0, s"$url received no cash")
    }
    // hub-only targets: share = opicCash div hub outdegree (3 + |source| % 4),
    // strictly shrinking as the hub's junk fan-out grows
    val hosts = graft.Tables(spark, sf, "documents")
      .select(lower(col("source")).as("ls"), length(col("source")).as("n"))
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val junk = opic.keys.filter(_.contains("/junk/")).toSeq
    assert(junk.nonEmpty, "fixture should mint hub-only junk targets")
    junk.foreach { url =>
      val ls = url.stripPrefix("https://").takeWhile(_ != '.')
      val outdeg = 3 + hosts(ls) % 4
      assert(opic(url) == (1L, Crawl.opicCash / outdeg),
        s"$url: expected hub-only share ${Crawl.opicCash / outdeg}")
    }
    // the observed share populations are exactly the fixture's
    // residue classes (plural at scales with >1 junk-bearing residue)
    val expectedShares = hosts.values.map(n => 3 + n % 4)
      .filter(_ > 3).map(Crawl.opicCash / _).toSet
    assert(junk.map(u => opic(u)._2).toSet == expectedShares,
      "hub shares should be exactly the fixture's outdegree classes")
    DataOps.blockedDomains.foreach(d =>
      assert(!opic.keys.exists(_.contains(d)), s"blocked host $d got cash"))
  }

  test("dsCrawlTraps: the verdict recomputes from fan-out, planted calendar " +
      "traps flag, the heavily-linked archive whitelists, frontier " +
      "templates stay benign, evidence mass reconciles") {
    val rows = Crawl.dsCrawlTraps(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (host, tpl, nUrls, sumRefs, trap, wl) =>
      assert(trap == (nUrls >= Crawl.trapMinUrls), s"$host $tpl: verdict")
      assert(wl == (trap &&
        sumRefs >= nUrls * Crawl.trapWhitelistRefs),
        s"$host $tpl: whitelist verdict")
      assert(sumRefs >= nUrls, s"$host $tpl: every candidate has evidence")
    }
    val (traps, benign) = rows.partition(_._5)
    assert(traps.nonEmpty && benign.nonEmpty, "both branches must be live")
    // flagged fan-out splits on evidence: calendar plants (evidence 1
    // per URL) stay trapped, the heavily-linked archive pagination
    // (evidence 3 per URL) whitelists — both classes must be live
    traps.foreach { case (host, tpl, nUrls, sumRefs, _, wl) =>
      assert(Set("/cal?d=N", "/archive?page=N").contains(tpl),
        s"$host: unexpected trap template $tpl")
      if (tpl == "/cal?d=N")
        assert(!wl && nUrls == 20 && sumRefs == 20,
          s"$host: calendar plant drifted")
      else
        assert(wl && nUrls == 20 && sumRefs == 60,
          s"$host: archive plant drifted")
    }
    assert(traps.exists(!_._6) && traps.exists(_._6),
      "trapped AND whitelisted templates must both be live")
    // the under-fan-out archive hosts (10 pages) stay benign
    assert(benign.exists(b => b._2 == "/archive?page=N" && b._3 == 10),
      "an under-the-bar archive must exist, benign")
    // the frontier's own candidates all appear, benign
    val frontierHosts = Crawl.dsCrawlFrontier(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(benign.exists(b => frontierHosts.exists(_.contains(b._1))),
      "frontier templates must be represented")
  }

  test("dsFrontierGated: flagged templates' candidates never pass, " +
      "whitelisted archives survive, benign candidates keep their evidence") {
    val gated = Crawl.dsFrontierGated(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val flagged = Crawl.dsCrawlTraps(spark, sf)
      .filter(col("trap") && !col("whitelisted"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(flagged.nonEmpty, "the planted calendar traps must flag")
    gated.keys.foreach { url =>
      val host = url.stripPrefix("https://").stripPrefix("http://")
        .takeWhile(c => c != '/' && c != '?')
      val tpl = url.replaceFirst("^[a-z][a-z0-9+.-]*://[^/?#]+", "")
        .replaceAll("[0-9]+", "N")
      assert(!flagged.contains((host, tpl)), s"trapped candidate passed: $url")
    }
    // the whitelist branch is LIVE in the gate: every planted archive
    // candidate (both the whitelisted 20-page and the under-bar
    // 10-page hosts) passes with its evidence
    val archive = gated.filter(_._1.contains("/archive?page="))
    assert(archive.nonEmpty && archive.values.forall(_ == 3L),
      s"whitelisted archive candidates must survive: ${archive.take(3)}")
    // at this fixture: gated == benign frontier + every archive plant
    val frontier = Crawl.dsCrawlFrontier(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gated == frontier ++ archive,
      "gate must pass exactly the benign frontier plus the archives")
  }

  test("dsCrawlWave: every gate bites — no trapped template, no condemned " +
      "host, agent-rules-allowed only, seeds at zero evidence, dense waves") {
    import graft.operators.Urls
    val wave = Crawl.dsCrawlWave(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(wave.nonEmpty)
    // trap gate: no calendar-template candidate is ever scheduled —
    // but the whitelisted heavily-linked archive pagination IS
    assert(!wave.exists(_._1.contains("/cal?")), "trapped template scheduled")
    assert(wave.exists(_._1.contains("/archive?page=")),
      "whitelisted archive candidates must reach the wave")
    // domain gate: hosts condemned at the curation bar never appear
    val bad = Crawl.dsHostQuality(spark, sf)
      .filter(col("n_kept") * 100 < col("n_pages") * Crawl.domainKeepPct)
      .collect().map(_.getString(0)).toSet
    assert(bad.nonEmpty, "the curation bar must condemn at least one host")
    assert(!wave.exists(w => bad.contains(w._3)), "condemned host scheduled")
    // robots under the product token: re-filtering the scheduled set
    // through the agent rules is the identity
    val hosts = graft.Tables(spark, sf, "documents")
      .select(concat(lower(col("source")), lit(".example.com")).as("host"),
        col("source")).distinct()
    val arules = Urls.robotsRules(hosts, col("host"),
      Urls.syntheticRobots(col("source")),
      agent = Some(Crawl.crawlProductToken))
    import spark.implicits._
    val scheduled = wave.map(_._1).toSeq.toDF("url")
    assert(Urls.robotsFilter(scheduled, col("url"), arules).count() ==
      wave.length, "a scheduled URL violates the chosen agent group")
    // sitemap seeds participate at zero evidence; waves stay dense
    assert(wave.exists(_._2 == 0L), "no zero-evidence seed scheduled")
    wave.groupBy(_._3).foreach { case (host, rows) =>
      val cap = rows.head._4
      val byWave = rows.groupBy(_._5).view.mapValues(_.size).toMap
      val maxW = byWave.keys.max
      (0L to maxW).foreach { w =>
        val n = byWave.getOrElse(w, 0)
        assert(n > 0 && n <= cap, s"$host wave $w density $n vs cap $cap")
        if (w < maxW) assert(n == cap, s"$host wave $w not full")
      }
    }
  }

  test("dsCrawlWaveFresh: due refetches join the wave at evidence 0 " +
      "through every gate; the discovery pool is unchanged") {
    import graft.operators.Urls
    val wave = Crawl.dsCrawlWave(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val fresh = Crawl.dsCrawlWaveFresh(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val due = Crawl.dsRecrawlLastmod(spark, sf)
      .filter(col("due_wave_eff") === 1)
      .collect().map(_.getString(0)).toSet
    assert(due.nonEmpty, "the due set must be live")
    // the fresh pool = the plain wave's candidates (same priorities)
    // + a nonempty subset of the due set at priority 0
    val freshMap = fresh.map(r => r._1 -> r._2).toMap
    assert(wave.keySet.subsetOf(freshMap.keySet),
      "no discovery candidate may be lost")
    wave.foreach { case (u, p) =>
      assert(freshMap(u) == p, s"$u: discovery priority drifted") }
    val refetches = fresh.filter(r => !wave.contains(r._1))
    assert(refetches.nonEmpty, "due refetches must be scheduled")
    refetches.foreach { case (u, p, _, _, _) =>
      assert(due.contains(u), s"non-due refetch scheduled: $u")
      assert(p == 0L, s"$u: refetch must carry evidence 0")
    }
    // every gate still bites: condemned hosts and agent-disallowed
    // URLs never appear among the refetches
    val bad = Crawl.dsHostQuality(spark, sf)
      .filter(col("n_kept") * 100 < col("n_pages") * Crawl.domainKeepPct)
      .collect().map(_.getString(0)).toSet
    assert(refetches.forall(r => !bad.contains(r._3)),
      "condemned host refetched")
    import spark.implicits._
    val hosts = graft.Tables(spark, sf, "documents")
      .select(concat(lower(col("source")), lit(".example.com")).as("host"),
        col("source")).distinct()
    val arules = Urls.robotsRules(hosts, col("host"),
      Urls.syntheticRobots(col("source")),
      agent = Some(Crawl.crawlProductToken))
    val rf = refetches.map(_._1).toSeq.toDF("url")
    assert(Urls.robotsFilter(rf, col("url"), arules).count() ==
      refetches.length, "a refetch violates the chosen agent group")
    // waves stay dense and capped per host
    fresh.groupBy(_._3).foreach { case (host, rows) =>
      val cap = rows.head._4
      val byWave = rows.groupBy(_._5).view.mapValues(_.size).toMap
      val maxW = byWave.keys.max
      (0L to maxW).foreach { w =>
        val n = byWave.getOrElse(w, 0)
        assert(n > 0 && n <= cap, s"$host wave $w density $n vs cap $cap")
        if (w < maxW) assert(n == cap, s"$host wave $w not full")
      }
    }
  }

  test("dsFrontierRedirects: a candidate aliasing fetched content never " +
      "schedules; fresh-content redirects stay; direct candidates are " +
      "exactly the frontier") {
    val rows = Crawl.dsFrontierRedirects(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val (redirecting, direct) = rows.partition(r => r._1 != r._3)
    // direct candidates pass untouched: exactly the benign frontier
    val frontier = Crawl.dsCrawlFrontier(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct.map(r => r._1 -> r._2).toMap == frontier,
      "direct candidates must be exactly the frontier")
    // every surviving redirect aliases UNfetched content (/old/fresh
    // → /fresh), and every planted fetched-alias candidate is gone
    assert(redirecting.nonEmpty, "the fresh-redirect branch must be live")
    redirecting.foreach { case (url, _, fin) =>
      assert(url.contains("/old/fresh") && fin.endsWith("/fresh"),
        s"unexpected surviving redirect: $url -> $fin")
    }
    val crawled = Crawl.dsCrawl(spark, sf)
      .select("canon_url").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => !crawled.contains(r._3)),
      "no scheduled candidate may alias fetched content")
    // the planted fetched-alias candidates existed and were dropped:
    // one /old/<minpath> candidate per unblocked host went in
    assert(!rows.exists(r => r._1.contains("/old/") &&
      !r._1.contains("/old/fresh")),
      "fetched-alias candidates must be dropped")
  }

  test("dsCrawlCanonical: one admission per declared final, crawled " +
      "finals are dup_fetched, extraction round-trips the fixture") {
    val rows = Crawl.dsCrawlCanonical(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.map(_._3).toSet == Set("dup_fetched", "admitted", "dup_alias"),
      "all three verdict branches must be live on the fixture")
    val crawled = Crawl.dsCrawl(spark, sf)
      .select("canon_url").collect().map(_.getString(0)).toSet
    rows.groupBy(_._2).foreach { case (fin, grp) =>
      val verdicts = grp.map(_._3)
      if (crawled.contains(fin))
        assert(verdicts.forall(_ == "dup_fetched"),
          s"declarers of crawled content $fin must all be dup_fetched")
      else {
        assert(verdicts.count(_ == "admitted") == 1,
          s"exactly one admission per uncrawled final $fin: $verdicts")
        assert(grp.filter(_._3 == "admitted").map(_._1).head ==
          grp.map(_._1).min, "min requested_canon wins the admission")
        assert(verdicts.forall(v => v == "admitted" || v == "dup_alias"))
      }
    }
    // no self-aliases, and every final is genuinely canonical form
    assert(rows.forall(r => r._1 != r._2), "src == dst must be filtered")
    // extraction agrees with the standalone operator on a sample:
    // every declaring page's href resolves+canonicalizes to this
    // row's final (the entity-decode and relative-resolve chain)
    val byResidue = rows.groupBy(r =>
      if (r._2.contains("/canon/hub")) 3
      else if (crawled.contains(r._2)) 4 else 5)
    assert(byResidue.keySet == Set(3, 4, 5),
      s"all three planted declaration shapes must survive: ${byResidue.keySet}")
    assert(rows.filter(_._2.contains("/canon/hub"))
        .forall(_._2.endsWith("?x=1&y=2")),
      "the &amp; attribute escape must decode before canonicalization")
  }

  test("crawlWave: a persisted verdict frame reproduces the " +
      "self-contained wave exactly, for both wave flavors") {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    val dir = java.nio.file.Files.createTempDirectory("wave_lv").toString
    // the verdict frame a deployment persists (the streaming
    // hostQuality shape), derived here from the same front door the
    // self-contained path runs — written and read back so the wave
    // consumes a genuine parquet ledger, not a shared plan
    Crawl.dsCrawl(spark, sf)
      .select(graft.operators.Urls.hostOf(col("canon_url")).as("host"),
        when(col("verdict") === "kept", 1L).otherwise(0L).as("k"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_pages"), sum(col("k")).as("n_kept"))
      .withColumn("quality_ok",
        col("n_kept") * 100 >= col("n_pages") * Crawl.domainKeepPct)
      .write.mode("overwrite").parquet(dir)
    val verdicts = spark.read.parquet(dir)
    for (fresh <- Seq(false, true)) {
      val self = (if (fresh) Crawl.dsCrawlWaveFresh(spark, sf)
                  else Crawl.dsCrawlWave(spark, sf))
        .collect().map(_.toSeq).toSet
      val fed = Crawl.crawlWave(spark, sf, fresh = fresh,
          ledgerVerdicts = Some(verdicts))
        .collect().map(_.toSeq).toSet
      assert(fed == self,
        s"ledger-fed wave (fresh=$fresh) must equal the self-contained wave")
    }
  }

  test("dsRecrawl: ladder recomputes from evidence, due waves stagger " +
      "within the interval, ledger agrees with dd_url_dedup") {
    val rows = Crawl.dsRecrawl(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (url, fetches, variants, keeper, interval, due) =>
      assert(variants <= fetches && variants >= 1, s"$url: evidence order")
      val expected =
        if (variants >= 3) 1L
        else if (variants == 2) 4L
        else if (fetches >= 2) 64L
        else 8L
      assert(interval == expected, s"$url: ladder drifted")
      assert(due == 1 + keeper % interval && due >= 1 && due <= interval,
        s"$url: due wave outside its interval")
    }
    // planted ledgers keep the hot and confirmed-static rungs live
    val byUrl = rows.map(r => r._1 -> r).toMap
    assert(byUrl("https://plant.example.com/hot")._5 == 1L)
    assert(byUrl("https://plant.example.com/static")._5 == 64L)
    // the fetch ledger is dd_url_dedup's, with change evidence added
    val dedup = DataOps.ddUrlDedup(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.filterNot(_._1.startsWith("https://plant.")).foreach {
      case (url, fetches, _, keeper, _, _) =>
        assert(dedup(url) == (keeper, fetches), s"$url: ledger drifted")
    }
  }

  test("dsRecrawlLastmod: a fresh lastmod forces due NOW, stale/absent " +
      "falls back to the ladder, every branch live") {
    val base = Crawl.dsRecrawl(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5))).toMap // interval, due_wave
    val rows = Crawl.dsRecrawlLastmod(spark, sf).collect().map { r =>
      (r.getString(0), r.getLong(4), r.getLong(5),
        Option(r.getDate(6)), r.getDate(7), r.getBoolean(8), r.getLong(9))
    }
    assert(rows.map(_._1).toSet == base.keySet,
      "lastmod view covers exactly the ladder")
    rows.foreach { case (url, interval, due, lastmod, lastFetch, dueNow, eff) =>
      assert((interval, due) == base(url), s"$url: ladder drifted")
      val expectNow = lastmod.exists(lm => lm.after(lastFetch))
      assert(dueNow == expectNow, s"$url: due_now drifted")
      assert(eff == (if (dueNow) 1L else due), s"$url: override drifted")
    }
    // all three branches live: fresh lastmod overrides a NON-hot rung,
    // stale lastmod falls back, absent lastmod falls back
    assert(rows.exists(r => r._6 && r._2 > 1 && r._3 != 1),
      "a planted fresh lastmod must override a later ladder wave")
    assert(rows.exists(r => r._4.isDefined && !r._6),
      "a stale lastmod must fall back to the ladder")
    assert(rows.exists(r => r._4.isEmpty),
      "URLs without an announcement keep the ladder")
  }
}
