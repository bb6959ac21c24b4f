package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, Sharding}
import graft.pipeline.Allocate

/** Scale rehearsal main: replicate the sf tables ×MULT in-plan and
  * time the operators whose cost curves matter most at 100 TB —
  * allocation, corpus dedup, connected components, the window family,
  * the SimHash Hamming join (both band widths), the persisted-index
  * probe pair (build once, probe a fixed batch), the prefix-sum
  * family (global shard packing + grouped mixture sampling), the
  * decontamination sweep, and the ExactSubstr span pair (detection +
  * trim). Run with SPARK_GRAFT_MULT at
  * 1 / 10 / 100 / 1000 and compare wall-clocks: a healthy operator
  * grows ≲ linearly per decade on fixed cores, and a probe against
  * persisted state should stay ~flat (results tables in BASELINE.md).
  *
  * Replication is salted so the bigger corpus is realistic, not
  * degenerate:
  *  - documents: every token gets a per-replica suffix, so replicas
  *    occupy disjoint shingle/token vocabularies — the corpus keeps
  *    its planted near-dup rate per replica instead of every doc
  *    acquiring MULT exact twins (which would measure the input's
  *    quadratic duplicate structure, not the operator).
  *  - lineitem/orders: keys that define sequences/partitions
  *    (l_orderkey, o_orderkey) are salted unique; grouping keys
  *    (l_partkey, o_custkey) are kept, so per-product demand
  *    sequences and per-customer windows genuinely grow ×MULT — the
  *    stress is on partition depth, the hard axis for sort-based
  *    operators.
  */
object Rehearsal {

  private def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** df × range(mult) with per-replica rewrites. */
  private def replicate(df: DataFrame, mult: Int)(rewrite: DataFrame => DataFrame): DataFrame =
    rewrite(df.crossJoin(df.sparkSession.range(mult).select(col("id").as("__rep"))))

  /** Raw band-join candidate count for a simhash band layout — the
    * pre-distinct volume that drives the Hamming join's cost. */
  private def simhashCandidates(docs: DataFrame, bits: Int, bandBits: Int): Long = {
    val nBands = bits / bandBits
    val mask = (1L << bandBits) - 1
    val sim = Dedup.simhash(docs, col("text"), col("doc_id"), bits)
    val bands = sim.select(col("doc_id"),
        explode(array((0 until nBands).map(b => struct(
          lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bkey"))): _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bkey").as("bkey"))
    bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band")
        && col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.get("SPARK_GRAFT_MULT").flatMap(_.toIntOption).getOrElse(10)
    val only = sys.env.get("SPARK_GRAFT_REHEARSE").map(_.split(",").map(_.trim).toSet)
    val spark = GraftSession.create("graft-rehearsal")
    // Decade-scaled shuffle parallelism (the partitions-fit-in-memory
    // sizing rule): at 1000x a 32-way reduce hands each task ~1/32 of
    // ~5 M documents' aggregate state, which is what OOM'd the
    // pipeline composite's tail — more, smaller reduce partitions is
    // the production answer, and AQE coalesces the ones that come out
    // small. Opt-in per run so previously-recorded rows keep their
    // measurement conditions.
    sys.env.get("SPARK_GRAFT_SHUFFLE").filter(_.nonEmpty).foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n))

    val m = lit(mult.toLong)
    val docsR = replicate(Tables(spark, sfDir, "documents"), mult) { d =>
      d.select((col("doc_id") * m + col("__rep")).as("doc_id"),
        // suffix EVERY token with the replica id → replica vocabularies
        // are pairwise disjoint; within a replica the text (and its
        // near-dup structure) is isomorphic to the original
        regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1_"), col("__rep"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    val lineR = replicate(Tables(spark, sfDir, "lineitem"), mult) { d =>
      d.withColumn("l_orderkey", col("l_orderkey") * m + col("__rep")).drop("__rep")
    }
    val ordR = replicate(Tables(spark, sfDir, "orders"), mult) { d =>
      d.withColumn("o_orderkey", col("o_orderkey") * m + col("__rep")).drop("__rep")
    }
    val part = Tables(spark, sfDir, "part")
    // embeddings: ids salted unique; each replica's vectors get a
    // deterministic per-replica, per-dim perturbation so the corpus
    // isn't MULT exact copies of the same point cloud (which would
    // hand the quantizers degenerate, identical cells)
    val embR = replicate(Tables(spark, sfDir, "embeddings"), mult) { d =>
      d.select((col("vec_id") * m + col("__rep")).as("vec_id"),
        zip_with(col("embedding"),
          transform(sequence(lit(1), size(col("embedding"))),
            i => (col("__rep") % 97).cast("float") * lit(1e-3f) * i.cast("float")),
          (x, p) => x + p).as("embedding"),
        col("label"))
    }

    // Persisted-index probe pair: build once per corpus size (lazy),
    // then probe with a FIXED-size batch — the incremental-dedup
    // headline is probe cost ∝ |batch| + collisions, so across corpus
    // decades the probe row should stay ~flat while the build row
    // tracks the corpus. Batch = the base table on fresh (negative)
    // ids: even rows wear replica-0 vocabulary (exact corpus dups →
    // they exercise the md5/verify path), odd rows a fresh vocabulary
    // (novel → they exercise the miss path).
    val incrRoot = s"${System.getProperty("java.io.tmpdir")}/graft-rehearsal-idx/m$mult"
    lazy val incrIndex = Dedup.ensurePersistedIndex(spark, incrRoot, s"rehm$mult") {
      Dedup.indexCorpus(docsR, col("text"), col("doc_id"), 3)
    }
    lazy val incrBatch = Tables(spark, sfDir, "documents").select(
      (-(col("doc_id") + 1)).as("doc_id"),
      regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1_"), when(pmod(col("doc_id"), lit(2)) === 0, lit("0"))
          .otherwise(lit("b")))).as("text"))

    // Incremental-SemDeDup probe pair, same build-once/probe-fixed
    // discipline: the stored state is the sampled-quantizer cell
    // assignment (bucketed on centroid_id) + its centroid table; the
    // fixed batch carries near-twins of replica-0 corpus vectors on
    // even ids (the dominance path — replica 0 is unperturbed, so the
    // twin's cosine is ~1) and shifted fresh vectors on odd ids (the
    // novel path). Probe cost must track |batch|·cellwidth, not the
    // corpus.
    val semIncrRoot = s"${System.getProperty("java.io.tmpdir")}/graft-rehearsal-semidx/m$mult"
    lazy val semIncrIndex = Dedup.ensurePersistedEmbeddingIndex(
        spark, semIncrRoot, s"rehsem$mult") {
      import spark.implicits._
      val cents = graft.operators.Similarity.lloydTrainSampled(
          embR.repartition(32), 64, 2, mult.toLong)
        .toDF("centroid_id", "cent")
      (graft.operators.Similarity.lloydAssign(embR.repartition(32), cents), cents)
    }
    lazy val semIncrBatch = Tables(spark, sfDir, "embeddings").select(
      (-(col("vec_id") + 1)).as("vec_id"),
      when(pmod(col("vec_id"), lit(2)) === 0,
          transform(col("embedding"), x => x * lit(1.000001f)))
        .otherwise(transform(col("embedding"), x => x + lit(0.5f)))
        .as("embedding"))

    // RAG probe pair, same build-once/probe-fixed discipline: the
    // chunk → hash-embed → sign-LSH index is the corpus-sized
    // artifact (persisted bucketed on `bucket`, the serving layout);
    // the probe retrieves top-k chunks for a FIXED 200-document query
    // batch — |Q|-bound bucket probes against the stored layout, so
    // across corpus decades the probe row must stay ~flat while the
    // build row tracks the corpus (chunk count ∝ tokens).
    val ragRoot = s"${System.getProperty("java.io.tmpdir")}/graft-rehearsal-ragidx/m$mult"
    lazy val ragIndex = graft.operators.Bucketing.ensureBucketed(spark,
        s"rag_reh_m$mult", s"$ragRoot/index", Seq("bucket"), 8) {
      graft.operators.Rag.chunkIndex(docsR.repartition(32),
        col("text"), col("doc_id"), 64, 16)
    }
    lazy val ragBatch = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 200).select(col("doc_id"), col("text"))


    // shared by crawl_wave / crawl_wave_fresh: the production wave,
    // optionally + the recrawl-due refetch union (r18)
    def crawlWaveCase(withDue: Boolean): Long = {
        import graft.operators.{Html, Urls}
        val D = graft.queries.DataOps
        val C = graft.queries.Crawl
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val crawled = org.apache.spark.sql.GraftBridge.stageLocal(
          pagesF.select(col("referrer").as("url")).distinct())
        val frontier = pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            D.blockedDomains))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url").agg(count(lit(1)).as("n_refs"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")), D.blockedDomains))
        val hostsF = d.select(
            concat(lower(col("source")), lit(".example.com")).as("host"),
            col("source")).distinct()
        val seedLocs = hostsF.select(explode(
            Urls.sitemapLocs(Urls.syntheticSitemap(col("source")))).as("loc"))
          .select(Urls.canonicalize(col("loc")).as("url")).distinct()
        val seedPlanted = d.groupBy(col("source"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("url"))
        val seeds = seedLocs.unionByName(seedPlanted)
        val fetchedSeeds = crawled
          .join(broadcast(seeds), Seq("url"), "left_semi").distinct()
        val live = seeds.join(fetchedSeeds, Seq("url"), "left_anti")
        val calBait = hostsF
          .select(col("host"),
            (pmod(length(col("source")), lit(4)) * 20).cast("int").as("tn"))
          .select(col("host"),
            explode(when(col("tn") > 0, sequence(lit(0), col("tn") - 1))
              .otherwise(array())).as("k"))
          .select(concat(lit("https://"), col("host"), lit("/cal?d="),
            col("k")).as("url"), lit(1L).as("n_refs"))
        val cand = org.apache.spark.sql.GraftBridge.stageLocal(
          frontier
            .unionByName(live.select(col("url"), lit(0L).as("n_refs")))
            .unionByName(calBait)
            .groupBy("url").agg(max(col("n_refs")).as("n_refs"))
            .withColumn("host", Urls.hostOf(col("url")))
            .withColumn("template", C.urlTemplate(col("url"))))
        val traps = cand.groupBy("host", "template")
          .agg(count(lit(1)).as("n_urls"))
          .filter(col("n_urls") >= C.trapMinUrls).select("host", "template")
        val untrapped = cand.join(broadcast(traps),
          Seq("host", "template"), "left_anti")
        // fetch-ledger domain gate: winners + extraction + verdicts
        val winners = d
          .select(col("doc_id"), col("source"), col("text"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("url")),
            D.blockedDomains))
          .select(col("doc_id"), col("source"), col("text"),
            Urls.canonicalize(col("url")).as("canon_url"))
          .groupBy("canon_url")
          .agg(min(struct(col("doc_id"), col("source"), col("text"))).as("w"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
            D.blockedDomains))
          .select(col("canon_url"), col("w.doc_id").as("doc_id"),
            col("w.source").as("source"), col("w.text").as("text"))
        val ext = Html.extractMainText(
          winners.select(col("doc_id"), col("canon_url"),
            Html.syntheticPage(col("text"), col("source")).as("html")),
          col("html"), col("doc_id"), carry = Seq(col("canon_url")),
          dropNullHtml = false)
        val nTok = when(col("main_text") === "", 0L)
          .otherwise(size(split(col("main_text"), "[ \\n]")).cast("long"))
        val badHosts = ext.select(
            Urls.hostOf(col("canon_url")).as("host"),
            when(nTok >= C.crawlMinTokens, 1L).otherwise(0L).as("k"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_pages"), sum(col("k")).as("n_kept"))
          .filter(col("n_kept") * 100 < col("n_pages") * C.domainKeepPct)
          .select("host")
        val pool =
          if (!withDue) untrapped
          else {
            // the freshness half (r18): the recrawl ladder + the
            // broadcast lastmod override (recrawl_lastmod's shape),
            // filtered to the next wave's due set, at evidence 0 —
            // trap-gated, never trap-counted
            val ladder = d
              .select(col("doc_id"), col("text"),
                Urls.syntheticUrl(col("doc_id"), col("source")).as("u"))
              .filter(!Urls.hostBlocked(Urls.rawHostLower(col("u")),
                D.blockedDomains))
              .select(col("doc_id"), md5(col("text").cast("binary")).as("h"),
                Urls.canonicalize(col("u")).as("canon_url"))
              .groupBy("canon_url")
              .agg(count(lit(1)).as("n_fetches"),
                countDistinct(col("h")).as("n_variants"),
                min(col("doc_id")).as("keeper_id"))
              .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
                D.blockedDomains))
              .withColumn("interval_waves",
                when(col("n_variants") >= 3, 1L)
                  .when(col("n_variants") === 2, 4L)
                  .when(col("n_fetches") >= 2, 64L)
                  .otherwise(8L))
              .withColumn("due_wave",
                lit(1L) + pmod(col("keeper_id"), col("interval_waves")))
            val meta = Urls.sitemapMeta(
                hostsF.select(col("host"),
                  Urls.syntheticSitemap(col("source")).as("xml")),
                col("host"), col("xml"))
              .filter(col("kind") === "urlset" && col("lastmod").isNotNull)
              .select(Urls.canonicalize(col("loc_url")).as("canon_url"),
                col("lastmod").cast("date").as("lastmod"))
              .groupBy("canon_url").agg(max(col("lastmod")).as("lastmod"))
            val due = ladder.join(broadcast(meta), Seq("canon_url"), "left")
              .withColumn("last_fetch",
                when(length(Urls.hostOf(col("canon_url"))) % 2 === 0,
                  lit("2024-01-15")).otherwise(lit("2024-02-14"))
                  .cast("date"))
              .withColumn("due_now", col("lastmod").isNotNull &&
                col("lastmod") > col("last_fetch"))
              .filter(col("due_now") || col("due_wave") === 1)
              .select(col("canon_url").as("url"), lit(0L).as("n_refs"))
              .withColumn("host", Urls.hostOf(col("url")))
              .withColumn("template", C.urlTemplate(col("url")))
            untrapped.unionByName(
              due.join(broadcast(traps), Seq("host", "template"),
                "left_anti"))
          }
        val gated = pool
          .join(broadcast(badHosts), Seq("host"), "left_anti")
          .select(col("url"), col("n_refs"))
        val arules = Urls.robotsRules(hostsF, col("host"),
          Urls.syntheticRobots(col("source")),
          agent = Some(C.crawlProductToken))
        val allowed = Urls.robotsFilter(gated, col("url"), arules)
        val caps = Urls.robotsDelays(hostsF, col("host"),
            Urls.syntheticRobots(col("source")),
            agent = Some(C.crawlProductToken))
          .select(col("host"), greatest(lit(1L),
            floor(lit(C.crawlWavePeriodSec) / col("delay_s"))).as("cap"))
        val waves = Urls.politeWavesCapped(allowed, col("url"),
          col("n_refs"), caps, C.crawlPerHostPerWave)
        waves.agg(count(lit(1)), sum(col("wave")), sum(length(col("url"))))
          .collect()(0).getLong(0)
    }

    val cases: Seq[(String, () => Long)] = Seq(
      "dd_incr_build" -> { () => incrIndex.buckets.count() },
      "dd_incr_probe" -> { () =>
        Dedup.incremental(incrIndex, incrBatch,
          col("text"), col("doc_id"), 3, 0.3).count()
      },
      "dd_semdedup_incr_build" -> { () => semIncrIndex._1.count() },
      "dd_semdedup_incr_probe" -> { () =>
        Dedup.incrementalSemDedup(semIncrIndex._1, semIncrIndex._2,
            semIncrBatch, 0.3)
          .filter(!col("kept")).count()
      },
      "alloc_plan" -> { () =>
        val demand = lineR
          .join(broadcast(part.select(col("p_partkey"),
            (col("p_size").cast("long") * 100L).as("opening_stock"))),
            col("l_partkey") === col("p_partkey"))
          .select(
            col("l_orderkey").as("order_id"),
            col("l_suppkey").as("customer_id"),
            date_format(col("l_shipdate"), "yyyy-MM-dd'T'HH:mm:ss").as("order_datetime"),
            col("l_partkey").as("product_id"),
            col("l_quantity").cast("long").as("qty"),
            round(col("l_extendedprice") / col("l_quantity"), 2)
              .cast("decimal(38,18)").as("unit_price"),
            col("opening_stock"),
            date_format(col("l_shipdate"), "yyyyMMdd").cast("int").as("day"),
            col("l_orderkey").as("seq"),
            col("l_linenumber").as("pos"))
        Allocate.viaPlan(demand)
          .groupBy("product_id").agg(sum(col("quantity")).as("filled_qty"))
          .count()
      },
      "dd_corpus" -> { () =>
        Dedup.dedupedCorpus(docsR, col("text"), col("doc_id"), 3, 0.3).count()
      },
      // the ExactSubstr pair: detection is two keyed shuffles + one
      // per-doc window; trim adds the cover-position ANTI join and the
      // per-doc reassembly (consumed via length so pruning can't skip
      // it). Salted replicas keep per-replica dup structure, so
      // dup-window volume grows ×MULT — linear is the honest floor.
      "repeated_spans" -> { () =>
        Dedup.repeatedSpans(docsR, col("text"), col("doc_id"), 4).count()
      },
      "trim_spans" -> { () =>
        Dedup.trimRepeatedSpans(docsR, col("text"), col("doc_id"), 4)
          .agg(sum(length(col("clean_text"))).cast("long"))
          .collect()(0).getLong(0)
      },
      // the two-level prefix-sum family: full-corpus running totals
      // (global + grouped) must scale like a groupBy, not a window
      "pack_shards" -> { () =>
        Sharding.packShards(docsR.select(col("doc_id"), col("text")),
            "doc_id", size(split(col("text"), " ")),
            budget = 100000L, blockSize = 10000L)
          .groupBy("shard_id").agg(sum(col("n_tokens"))).count()
      },
      "mix" -> { () =>
        // 10k tokens/source binds at every scale: work grows ×MULT
        // (the cumsum runs corpus-wide) while output stays ~fixed
        Sharding.mixByBudget(docsR.select(col("doc_id"), col("source"), col("text")),
            "source", "doc_id", size(split(col("text"), " ")),
            lit(10000L), blockSize = 10000L)
          .count()
      },
      "dd_cc" -> { () =>
        Graph.connectedComponents(
          Dedup.minhashCandidatePairs(docsR, col("text"), col("doc_id"), 3),
          "id_a", "id_b").count()
      },
      "window_running" -> { () =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        // consume the windowed column: a bare count() lets Catalyst
        // prune the unreferenced Window node away entirely
        ordR.select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
          .agg(count(col("running_spend"))).collect()(0).getLong(0)
      },
      "window_rank" -> { () =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        ordR.withColumn("rk", rank().over(w)).filter(col("rk") <= 3).count()
      },
      // the same top-3-per-customer answer through the O(k)-state
      // aggregate — the head-to-head for the window_rank sort
      "topk_agg" -> { () =>
        // rebuild the replicated frame under the bounded-agg child
        // session so the scoped fallback threshold governs this plan
        val sb = GraftSession.boundedAggSession(spark)
        val ordB = replicate(Tables(sb, sfDir, "orders"), mult) { d =>
          d.withColumn("o_orderkey", col("o_orderkey") * m + col("__rep")).drop("__rep")
        }
        val topk = udaf(new graft.functions.Aggregators.TopKByValue(3))
        ordB.select(col("o_custkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
            col("o_orderkey"))
          .groupBy("o_custkey")
          .agg(topk(col("cents"), col("o_orderkey")).as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .count()
      },
      // decontamination sweeps the WHOLE corpus once per eval release —
      // linear in the corpus is its honest floor; the eval side stays
      // fixed (1% of base docs wearing replica-0 vocabulary, so they
      // genuinely collide with one replica's worth of training text)
      "decontam" -> { () =>
        val evalR = Tables(spark, sfDir, "documents")
          .filter(pmod(col("doc_id"), lit(100L)) === 3)
          .select((-(col("doc_id") + 1)).as("doc_id"),
            regexp_replace(col("text"), lit("(\\S+)"), lit("$1_0")).as("text"))
        Dedup.contaminationPairs(docsR, evalR, col("text"), col("doc_id"), 5).count()
      },
      // BPE training: round count is FIXED (12), so cost per round =
      // one pair-count groupBy over the symbol frame — the salted
      // replicas multiply the distinct-word vocabulary by MULT, which
      // is exactly the dimension the word-keyed state must absorb
      "bpe_train" -> { () =>
        graft.operators.Bpe.trainMerges(docsR, col("text"), 12).count()
      },
      // tokenizer inference: train is fixed-round; the ×MULT axis is
      // the vocab-keyed dictionary join + per-doc reassembly. Consume
      // token counts so pruning can't skip the concat
      "bpe_encode" -> { () =>
        graft.operators.Bpe.encodeDocs(docsR, col("doc_id"), col("text"), 12)
          .agg(sum(col("n_tokens")).cast("long")).collect()(0).getLong(0)
      },
      // epoch shuffle: two grouped prefix sums over the replicated
      // corpus — must track pack_shards' groupBy-like growth, never
      // a single-task window collapse
      "epoch_shuffle" -> { () =>
        Sharding.epochShuffle(docsR, col("doc_id"), epochs = 2,
            numShards = 64, blocksPerEpoch = 1 << 12)
          .groupBy("epoch", "shard").agg(max(col("pos"))).count()
      },
      // the full filter→dedup curation composite: gates are
      // projections + doc-keyed aggs (linear), dedup sees only the
      // gate survivors — the composite should track dd_corpus. The
      // NLL cap is disabled (add-one smoothing inflates every score
      // as the salted vocabulary grows ×MULT, so a fixed cap would
      // empty the corpus and let dedup run on nothing); the LM gate's
      // COST still runs in full — only the comparison is vacuous
      "curate" -> { () =>
        // repartition: the base table is ONE parquet file, so the
        // replicated corpus inherits a single scan partition and every
        // gate stage before the first exchange serializes into one
        // task (caught live at 1000x — a 16-minute single-task gram
        // stage); r9/r10 rows measured that serialized shape
        val d = docsR.repartition(32)
        graft.operators.Curation.audit(d, col("text"), col("doc_id"),
            d.filter(col("source").isin("src0", "src1")),
            3, 0.3, 0.2, 0.6, maxAvgNll = 1e9)
          .filter(col("verdict") === "kept").count()
      },
      // Gopher repetition signals: per-n explode + doc-keyed groupBy.
      // Consume every signal column — a bare count() lets Catalyst
      // drop the unique-key left joins and prune all five subtrees
      "rep_ngrams" -> { () =>
        val r = graft.operators.TextAnalysis.repetitionSignals(
          docsR.repartition(32), col("text"), col("doc_id"))
        r.agg(count(lit(1)),
            sum(col("top_2gram_frac") + col("top_3gram_frac") + col("top_4gram_frac")
              + col("dup_5gram_frac") + col("dup_10gram_frac")))
          .collect()(0).getLong(0)
      },
      // cross-doc paragraph dedup: segmentation is a zero-shuffle
      // generator; the keep-first agg + winner join shuffle on the
      // paragraph hash — salted replicas keep per-replica paragraph
      // collision structure, so winner volume grows ×MULT (linear
      // floor). Consume reassembled text length so pruning can't
      // skip the per-doc rebuild
      "paragraph_dedup" -> { () =>
        Dedup.paragraphDedup(docsR, col("text"), col("doc_id"), 16)
          .agg(sum(length(col("clean_text"))).cast("long"))
          .collect()(0).getLong(0)
      },
      // boundary-aware paragraph dedup (r20): same keyed keep-first as
      // the grid form but segmentation follows real blank-line
      // boundaries of the paragraphed furniture — cost must track
      // paragraph_dedup (the segments are what changes, not the plan)
      "paragraph_lines" -> { () =>
        Dedup.paragraphDedupLines(docsR.select(col("doc_id"),
            Dedup.syntheticParagraphedDoc(col("text"), col("doc_id"))
              .as("text")),
            col("text"), col("doc_id"))
          .agg(sum(length(col("clean_text"))).cast("long"))
          .collect()(0).getLong(0)
      },
      // charset front door (r20): the batched byte walk over the
      // five-variant mixed-encoding fixture — pure partition-local
      // decode, must grow ≈linearly with zero reduce terms
      "charset_decode" -> { () =>
        graft.operators.Charset.decode(
            graft.operators.Charset.documentsAsFetches(docsR))
          .toDF()
          .agg(sum(length(col("text"))).cast("long"))
          .collect()(0).getLong(0)
      },
      // WARC chain (r20): assembly (one keyed shuffle — fixture
      // construction, charged here because a real ingest pays a read
      // instead) + the record walk + HTTP split + charset decode —
      // the byte-fed front door's pre-canonicalize cost
      "warc_chain" -> { () => {
        val w = graft.operators.Warc
        val blobs = w.documentsAsWarc(docsR,
          concat(lit("http://"), col("source"), lit(".example.com/d/"),
            col("doc_id").cast("string")),
          col("text"), col("doc_id"))
        val resp = w.httpResponses(w.records(blobs))
        graft.operators.Charset.decodedTagged(resp, col("body"),
            element_at(split(col("record_id"), ":"), -1).cast("long"),
            col("url"))
          .agg(sum(length(col("text"))).cast("long"))
          .collect()(0).getLong(0)
      }},
      // fixed-length packing: one global prefix sum + a span explode —
      // must track pack_shards (groupBy-like), span volume ≈
      // tokens/seqLen + docs
      "pack_fixed" -> { () =>
        Sharding.packFixedSequences(docsR.select(col("doc_id"), col("text")),
            "doc_id", size(split(col("text"), " ")),
            seqLen = 2048, blockSize = 10000L)
          .groupBy("seq_id").agg(sum(col("n_tokens"))).count()
      },
      // temperature mixing: one O(#groups) aggregate + broadcast rates
      // + a corpus filter — the only full-corpus pass is the scan
      "mix_temperature" -> { () =>
        Sharding.mixByTemperature(
            docsR.select(col("doc_id"), col("source"), col("text")),
            "source", col("doc_id"), size(split(col("text"), " ")),
            alpha = 0.7, budgetTokens = 100000L * mult)
          .count()
      },
      // NB classifier train+score in one pass: the salted vocabulary
      // multiplies the model frame ×MULT — exactly the dimension the
      // token-keyed join must absorb; per-doc fold is linear
      "nb_classify" -> { () =>
        // balanced weak label (half the sources positive) so the kept
        // count is a real split, not a prior-dominated constant
        val lbl = substring(col("source"), 4, 10).cast("int") < 10
        val model = graft.operators.QualityClassifier
          .trainNaiveBayes(docsR, col("text"), lbl)
        graft.operators.QualityClassifier.scoreNaiveBayes(
            docsR, col("text"), col("doc_id"), model,
            graft.operators.QualityClassifier.docPriors(docsR, lbl))
          .filter(col("nb_label")).count()
      },
      // vector family: codebook training cost is FIXED (sampled-free
      // deterministic loop over the full frame — the ×MULT axis);
      // encoding is m broadcast-argmin passes over every vector
      "pq_encode" -> { () =>
        graft.operators.Similarity.pqEncode(embR, m = 4, k = 4, iters = 2)
          .count()
      },
      // the composed IVFADC index: coarse train+assign, residuals,
      // m residual codebooks, m argmin encode passes — everything
      // full-scan shaped, no pairwise term anywhere
      "ivfpq_encode" -> { () =>
        graft.operators.Similarity.ivfPqEncode(embR, kc = 4, coarseIters = 2,
          m = 4, k = 4, iters = 2).count()
      },
      // coarse-quantizer assignment alone: one broadcast argmin pass
      "ivf_assign" -> { () =>
        val spark2 = embR.sparkSession
        import spark2.implicits._
        val cents = graft.operators.Similarity.lloydTrain(embR, 4, 2)
        graft.operators.Similarity.lloydAssign(embR,
            cents.toDF("centroid_id", "cent"))
          .groupBy("centroid_id").agg(count(lit(1))).count()
      },
      // BM25: corpus-sized term stats (tf/df/dl — all map-side
      // combined) + query-bound postings probes. Queries stay FIXED
      // (3 docs wearing replica-0 vocabulary, so they genuinely match
      // one replica's postings) — the honest floor is the linear
      // stats pass; probe cost must not grow with MULT
      "bm25" -> { () =>
        val sb = GraftSession.boundedAggSession(spark)
        // repartition AFTER the salting crossJoin: the base parquet is
        // one split, so the replicated frame would otherwise run its
        // whole tokenize/stats map side in a single task — a
        // small-file artifact a real many-split scan never has
        val docsB = replicate(Tables(sb, sfDir, "documents"), mult) { d =>
          d.select((col("doc_id") * m + col("__rep")).as("doc_id"),
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1_"), col("__rep"))).as("text"))
        }.repartition(32)
        val queriesB = Tables(sb, sfDir, "documents")
          .filter(col("doc_id") < 3)
          .select((-(col("doc_id") + 1)).as("doc_id"),
            regexp_replace(col("text"), lit("(\\S+)"), lit("$1_0")).as("text"))
        graft.operators.Rag.bm25TopK(docsB, col("text"), col("doc_id"),
          queriesB, col("text"), col("doc_id"), 5).count()
      },
      // entropy signals: the explode-free single-pass kernel — a pure
      // projection, so the decade curve must track the raw scan.
      // Consume both entropies so pruning can't drop a kernel call
      "entropy" -> { () =>
        graft.operators.TextAnalysis.entropySignals(docsR, col("text"), col("doc_id"))
          .agg(count(lit(1)),
            sum(col("char_entropy") + col("token_entropy")))
          .collect()(0).getLong(0)
      },
      // SemDeDup in its production (spill-decade) posture: the coarse
      // quantizer trains on the FIXED-SIZE deterministic hash sample
      // (sampleMod = MULT keeps the training set ~base-corpus-sized at
      // every decade) with a BOUNDED k — the r9 probe that scaled
      // k ∝ corpus (k=4·MULT) burned an hour of k·N broadcast-argmin
      // work at 1000x and heap-OOM'd inside Lloyd's mean reduction:
      // training cost is k·N·iters, so neither k nor the training N
      // may grow with the corpus. Wide cells are the PAIR stage's
      // problem, and maxCell bounds that at any scale (the 100x run of
      // the UNCAPPED form put one ballooned cell's |cell|^2 join in a
      // single 31-minute straggler task before the cap existed).
      "semdedup" -> { () =>
        // same single-split artifact as bm25: the N·k broadcast-argmin
        // assign runs BEFORE any exchange, so it inherits the base
        // file's one partition unless re-spread
        Dedup.semDedupSampled(embR.repartition(32), 0.3, maxCell = 2000,
            k = 64, iters = 2, sampleMod = mult.toLong)
          .filter(!col("kept")).count()
      },
      // DSIR on the single-pass kernels: fit is one bounded-state
      // graft_dsir_counts aggregate (long[2B] per task, map-side
      // combined — shuffle volume corpus-size-independent), scoring
      // one shuffle-free graft_dsir_score projection; the decade
      // curve must track the raw token scan (no pairwise term, no
      // vocabulary-keyed agg anywhere — this case deliberately runs
      // WITHOUT decade-scaled shuffle sizing to prove it). Salted
      // replica vocabularies keep the bucket model realistic (buckets
      // saturate, counts grow) rather than MULT exact copies of one
      // distribution. Consume the weights so pruning can't skip the
      // scoring pass.
      "dsir" -> { () =>
        graft.operators.Dsir.weights(docsR.repartition(32), col("text"),
            col("doc_id"), col("lang") === "en")
          .agg(count(lit(1)), sum(col("weight_micro")))
          .collect()(0).getLong(0)
      },
      // audio plumbing: wrap every doc as a real WAV container and run
      // the chunk-walk decode + PCM feature pass — batched
      // mapPartitions with zero shuffle, so the decade curve must
      // track the scan (the binary-column claim at corpus scale)
      "audio" -> { () =>
        import org.apache.spark.sql.functions.{col => c}
        val media = graft.operators.Multimodal.documentsAsAudio(
          docsR.repartition(32))
        graft.operators.Multimodal.audioFeatures(media).toDF()
          .agg(count(lit(1)), sum(c("rms_milli")), sum(c("mean_crossings")))
          .collect()(0).getLong(0)
      },
      // PMI: pair + unigram keyed aggs over the token stream, two
      // vocabulary-keyed joins, broadcast totals. The salted replica
      // vocabularies multiply BOTH the pair and unigram key spaces
      // ×MULT — the dimension a driver-side collocation counter
      // cannot absorb; the curve must stay keyed-agg linear
      // novelty: decontam-shaped (gram-keyed document-frequency agg +
      // keyed join back), but BOTH sides are the full corpus — the
      // gram key space grows ×MULT with the salted vocabularies
      "novelty" -> { () =>
        Dedup.noveltyScores(docsR.repartition(32), col("text"),
            col("doc_id"), 5)
          .agg(count(lit(1)), sum(col("novelty_ppm")))
          .collect()(0).getLong(0)
      },
      "pmi" -> { () =>
        graft.operators.TextAnalysis.pmiPairs(docsR.repartition(32),
            col("text"), 5)
          .agg(count(lit(1)), sum(col("pmi_micro")))
          .collect()(0).getLong(0)
      },
      // winnowing, full PRODUCTION posture (rolling-xxh64 gram kernel
      // + compiled deque selection): a pure per-doc projection until
      // the ~len/w selected rows — the decade curve must track the scan
      "winnow" -> { () =>
        graft.operators.Winnow.fingerprints(docsR.repartition(32),
          col("text"), col("doc_id"), 4, 4).count()
      },
      // the md5 oracle hash backend (selection kernel on both) — the
      // hash-swap head-to-head, measured at only ~12% in r10 because
      // hashing was never the dominant term
      "winnow_md5" -> { () =>
        graft.operators.Winnow.fingerprints(docsR.repartition(32),
          col("text"), col("doc_id"), 4, 4, oracleHash = true).count()
      },
      // the r10 production shape — kernel hashes but INTERPRETED
      // per-window argmin lambdas — the head-to-head that prices the
      // selection kernel (the term r10's hash swap left on the table)
      "winnow_interp" -> { () =>
        graft.operators.Winnow.fingerprints(docsR.repartition(32),
          col("text"), col("doc_id"), 4, 4, kernelSelect = false).count()
      },
      // the winnow PAIR verdict (fingerprint-keyed pair shuffle with
      // the hot-posting anti-join cap) — previously priced only via
      // the fingerprint case; salted replicas keep per-replica copy
      // structure, so shared-fingerprint volume grows ×MULT
      "winnow_pairs" -> { () =>
        val fps = graft.operators.Winnow.fingerprints(docsR.repartition(32),
          col("text"), col("doc_id"), 4, 4)
        graft.operators.Winnow.sharedPairs(fps, 2, 2000).count()
      },
      // exact containment pairs under the production cap posture
      // (maxPostingLen=2000, the mutual/semdedup skew-cap discipline):
      // the library DEFAULT stays the exact uncapped join — capping
      // changes semantics (drops pairs), so it is the caller's scale
      // decision — but at corpus scale the cap is mandatory (posting
      // lists densify, pair volume squares) and this row prices it
      "containment" -> { () =>
        Dedup.containmentPairs(docsR.repartition(32), col("text"),
          col("doc_id"), 3, 0.8, maxPostingLen = 2000).count()
      },
      // RAG probe pair: build-once (corpus-sized chunk+embed+bucket
      // layout) vs fixed-batch retrieve (|Q|-bound probes) — the
      // composite previously had no decade row at all
      "rag_build" -> { () => ragIndex.count() },
      "rag_probe" -> { () =>
        graft.operators.Rag.retrieve(ragIndex, ragBatch,
          col("text"), col("doc_id"), 8).count()
      },
      // cross-corpus mutual match: candidates are Σ_b |A_b|·|B_b| over
      // the sign-LSH buckets, and the perturbed replicas CLUSTER — a
      // fixed 16-plane run measured 2.5→4.4→134 s (30× at the second
      // decade, super-linear: hot buckets go quadratic). Two knobs,
      // both production posture: plane count grows with the corpus
      // (+4/decade = ×16 buckets per ×10 rows, so expected occupancy
      // FALLS), and maxBucket caps what occupancy statistics can't —
      // the hot buckets where the near-copy mass concentrates (the
      // r9 run without the cap: 99.1 s / 16× at the second decade,
      // recorded as the adversarial ceiling).
      "mutual" -> { () =>
        val planes = 16 + 4 * (math.log10(mult.toDouble).round.toInt)
        val e = embR.repartition(32)
        graft.operators.Similarity.mutualMatches(
          e.filter(pmod(col("vec_id"), lit(2)) === 0),
          e.filter(pmod(col("vec_id"), lit(2)) === 1), planes,
          maxBucket = 2000).count()
      },
      // margin alignment: the SAME capped candidate frame, staged once
      // through the constraint-free checkpoint (stageLocal at corpus
      // scale — it feeds the ranking and both per-side top-k
      // aggregates), plus two keyed windows and two keyed aggregates
      "margin" -> { () =>
        val planes = 16 + 4 * (math.log10(mult.toDouble).round.toInt)
        val e = embR.repartition(32)
        graft.operators.Similarity.marginMatches(
          e.filter(pmod(col("vec_id"), lit(2)) === 0),
          e.filter(pmod(col("vec_id"), lit(2)) === 1), k = 4, planes,
          maxBucket = 2000).count()
      },
      // the END-TO-END pipeline composite (ds_pipeline): curation
      // gates → LSH dedup over gate survivors → keyed semi-join →
      // token-budget shard packing — the one-plan job a production
      // run actually executes; its stages' individual 1000× rows are
      // green, this measures their composition (shared scans, one
      // optimizer pass). Same NLL-cap posture as `curate`.
      "pipeline" -> { () =>
        val d = docsR.repartition(32) // single-file artifact, see curate
        val kept = graft.operators.Curation.audit(d, col("text"), col("doc_id"),
            d.filter(col("source").isin("src0", "src1")),
            3, 0.3, 0.2, 0.6, maxAvgNll = 1e9)
          .filter(col("verdict") === "kept").select("doc_id")
        val survivors = d.join(kept, Seq("doc_id"))
          .select(col("doc_id"), col("text"))
        Sharding.packShards(survivors, "doc_id",
            size(split(col("text"), " ")), budget = 100000L, blockSize = 10000L)
          .groupBy("shard_id").agg(sum(col("n_tokens"))).count()
      },
      // Candy ingest handoff (S7 posture): the raw multiline-JSON day
      // files are unsplittable, and normalize's sequence-key contract
      // (order = file order) makes the derivation one task per day
      // file BY DESIGN — bounded by one day's volume, never by the
      // corpus. The scale posture is land-once: derive (day, seq) at
      // the per-day read, write day-partitioned parquet, and run the
      // bulk explode/enrich from the splittable landing. This case
      // measures the WHOLE handoff — per-day derivation + ×MULT
      // salted landing write + parquet-side normalize/enrich — the
      // row the curate family's serialized-scan failure says every
      // single-file ingest needs.
      "ingest" -> { () =>
        import graft.pipeline.{CandyPipeline, Model}
        val dataDir = "/root/reference/data/dataset_15"
        val land = java.nio.file.Files.createTempDirectory("graft_ingest").toString
        val tx = graft.io.JsonSource(Seq(s"$dataDir/transactions_*.json"),
            Model.transactionSchema).load(spark)
          .withColumn("day",
            regexp_extract(input_file_name(), "transactions_(\\d{8})", 1).cast("int"))
          .withColumn("seq", monotonically_increasing_id())
        // salt: every replica is a distinct business day with distinct
        // transaction ids; the landing partitions by the original day
        // (arrival layout — each real day lands once, its replicas
        // widen the files, not the directory count)
        val landed = tx
          .crossJoin(spark.range(mult).select(col("id").as("__rep")))
          .withColumn("day_key", col("day").cast("long") * m + col("__rep"))
          .withColumn("transaction_id",
            concat(col("transaction_id"), lit("_"), col("__rep")))
          .drop("__rep")
        landed.write.mode("overwrite").partitionBy("day").parquet(land)
        val products = graft.io.CsvSource(s"$dataDir/products.csv",
          Model.productSchema).load(spark)
        // bulk side: splittable parquet scan, keys ride as columns
        val normalized = spark.read.parquet(land)
          .select(col("transaction_id"), col("customer_id"), col("timestamp"),
            col("day_key"), col("seq"), posexplode(col("items")).as(Seq("pos", "item")))
          .select(col("transaction_id"), col("customer_id"), col("timestamp"),
            col("day_key"), col("seq"), col("pos"),
            col("item.product_id").as("product_id"),
            col("item.qty").as("qty"))
          .filter(col("qty").isNotNull)
        val n = CandyPipeline.enrich(normalized, products).count()
        // the landing is a per-run scratch artifact
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(land))
        n
      },
      // HTML main-text extraction: the crawl front door is a pure
      // kernel projection (no shuffle, no explode), so its decade
      // curve must track the raw byte scan — the page fixture
      // roughly 1.6×es each doc's bytes with markup. Sums consume
      // every output field so pruning can't skip the kernel.
      "html_extract" -> { () =>
        val pages = docsR.repartition(32).select(col("doc_id"),
          graft.operators.Html.syntheticPage(col("text"), col("source")).as("html"))
        graft.operators.Html.extractMainText(pages, col("html"), col("doc_id"),
            dropNullHtml = false) // synth html: non-null by construction
          .agg(count(lit(1)),
            sum(col("kept_blocks") + col("n_blocks") + col("n_links")),
            sum(length(col("main_text"))))
          .collect()(0).getLong(0)
      },
      // the crawl front door COMPOSED (ds_crawl): canon → blocklist →
      // keep-first with the PAGE PAYLOAD riding the min-struct
      // through the one exchange → kernel extraction → thin gate.
      // Map-side partial min keeps one payload per canon URL per
      // task, so shuffle volume ≈ distinct URLs × page size — the
      // posture a corpus join-back (two payload shuffles) would lose
      "crawl" -> { () => {
        import graft.operators.{Html, Urls}
        val d = docsR.repartition(32)
        val winners = d
          .select(col("doc_id"), col("source"), col("text"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("doc_id"), col("source"), col("text"),
            Urls.canonicalize(col("url")).as("canon_url"))
          .groupBy("canon_url")
          .agg(min(struct(col("doc_id"), col("source"), col("text"))).as("w"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("w.doc_id").as("doc_id"), col("w.source").as("source"),
            col("w.text").as("text"))
        val pages = winners.select(col("doc_id"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        Html.extractMainText(pages, col("html"), col("doc_id"),
            dropNullHtml = false) // synth html: non-null by construction
          .agg(count(lit(1)), sum(col("kept_blocks")),
            sum(length(col("main_text"))))
          .collect()(0).getLong(0)
      }},
      // the crawl front door as a STREAM: 50 micro-batches replayed
      // through IngestCrawl against its own settled frontier
      // (settleEvery=16 → three folds inside the run). The shape
      // under test is the per-batch admitted-delta probe: before the
      // frontier settle it read EVERY earlier batch dir (O(#batches)
      // per batch, O(N²) per run); now it must stay flat — late
      // batches no slower than early ones, with the fold cost landing
      // only on the settle batches. Per-batch wall-clocks go to
      // stderr; the case returns the admitted corpus size.
      "crawl_stream" -> { () => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.operators.{Html, Urls}
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val nBatches = 50
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_crawl_stream_m$mult").toString
        // batch payloads staged ONCE as b=…-partitioned parquet; the
        // stream carries only batch ids and a stream-static join
        // prunes each micro-batch to its slice (PartitionFilters on
        // b) — the r14 form collected every (doc_id, source, text)
        // tuple to the driver, ~5 GB at the 1000× decade. url/html
        // still synthesize IN-PLAN
        val stage = java.nio.file.Files
          .createTempDirectory(s"graft_crawl_stage_m$mult").toString
        docsR.select(col("doc_id"), col("source"), col("text"),
            pmod(col("doc_id"), lit(nBatches.toLong)).as("b"))
          .write.mode("overwrite").partitionBy("b").parquet(stage)
        val input = MemoryStream[Int]
        val fetches = input.toDF().toDF("b")
          .join(spark.read.parquet(stage), Seq("b"))
          .select(col("doc_id"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"),
            Html.syntheticPage(col("text"), col("source")).as("html"))
        val q = graft.streaming.IngestCrawl.crawledIngest(fetches, None, dir,
          graft.queries.DataOps.blockedDomains, settleEvery = 16)
        val perBatch =
          try (0 until nBatches).map { i =>
            val t0 = System.nanoTime()
            input.addData(i)
            q.processAllAvailable()
            val dt = (System.nanoTime() - t0) / 1e9
            System.err.println(f"REHEARSAL crawl_stream batch=$i sec=$dt%.2f")
            dt
          }.toVector
          finally q.stop()
        val early = perBatch.slice(2, 10)
        val late = perBatch.slice(perBatch.size - 8, perBatch.size)
        System.err.println(f"REHEARSAL crawl_stream early_mean=${
          early.sum / early.size}%.2f late_mean=${late.sum / late.size}%.2f")
        graft.streaming.Frontier.readLayered(spark, dir).count()
      }},
      // the streaming loop WITH the r18 OPIC cash ledger: the same
      // 50-batch replay, each batch additionally distributing every
      // admitted page's cash over its outlinks and folding CUMULATIVE
      // receipts through the settle protocol. The shape under test is
      // the per-batch cash term: one more co-partitioned state probe
      // + one link-keyed aggregate — per-batch cost must stay FLAT in
      // run length (the accumulated ledger is read through the
      // bucketed settled frontier, never rescanned delta-by-delta)
      "crawl_stream_cash" -> { () => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.operators.{Html, Urls}
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val nBatches = 50
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_cs_cash_m$mult").toString
        val cashDir = java.nio.file.Files
          .createTempDirectory(s"graft_cs_cashledger_m$mult").toString
        val stage = java.nio.file.Files
          .createTempDirectory(s"graft_cs_cashstage_m$mult").toString
        docsR.select(col("doc_id"), col("source"), col("text"),
            pmod(col("doc_id"), lit(nBatches.toLong)).as("b"))
          .write.mode("overwrite").partitionBy("b").parquet(stage)
        val input = MemoryStream[Int]
        val fetches = input.toDF().toDF("b")
          .join(spark.read.parquet(stage), Seq("b"))
          .select(col("doc_id"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"),
            Html.syntheticPage(col("text"), col("source")).as("html"))
        val q = graft.streaming.IngestCrawl.crawledIngest(fetches, None, dir,
          graft.queries.DataOps.blockedDomains, settleEvery = 16,
          cashDir = Some(cashDir))
        val perBatch =
          try (0 until nBatches).map { i =>
            val t0 = System.nanoTime()
            input.addData(i)
            q.processAllAvailable()
            val dt = (System.nanoTime() - t0) / 1e9
            System.err.println(f"REHEARSAL crawl_stream_cash batch=$i sec=$dt%.2f")
            dt
          }.toVector
          finally q.stop()
        val early = perBatch.slice(2, 10)
        val late = perBatch.slice(perBatch.size - 8, perBatch.size)
        System.err.println(f"REHEARSAL crawl_stream_cash early_mean=${
          early.sum / early.size}%.2f late_mean=${late.sum / late.size}%.2f")
        graft.streaming.IngestCrawl.cashReceipts(spark, cashDir).count()
      }},
      // the streaming loop WITH the fetch ledger AND a dir-backed
      // recrawl due-set snapshot (r19): the 50-batch replay paying the
      // per-batch change-evidence ledger probe + the due-set probe —
      // the term under test is the DUE-PROBE cost staying FLAT in run
      // length (the snapshot is one immutable wave-sized parquet dir,
      // probed per batch; the pre-r19 driver pin collected it to
      // driver memory instead). The planted due set is disjoint from
      // the corpus (the semi-join yields nothing), so the measured
      // term is pure probe cost, not admission churn.
      "crawl_stream_recrawl" -> { () => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.operators.{Html, Urls}
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val nBatches = 50
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_cs_rc_m$mult").toString
        val fetchedDir = java.nio.file.Files
          .createTempDirectory(s"graft_cs_rcledger_m$mult").toString
        val snapDir = java.nio.file.Files
          .createTempDirectory(s"graft_cs_rcsnap_m$mult").toString
        val stage = java.nio.file.Files
          .createTempDirectory(s"graft_cs_rcstage_m$mult").toString
        docsR.select(col("doc_id"), col("source"), col("text"),
            pmod(col("doc_id"), lit(nBatches.toLong)).as("b"))
          .write.mode("overwrite").partitionBy("b").parquet(stage)
        // wave-sized due set: 1000 × mult URLs (100k at the 100×
        // decade — the politeness window's output order)
        val due = spark.range(1000L * mult)
          .select(concat(lit("https://due.example.com/"),
            col("id")).as("canon_url"))
        val input = MemoryStream[Int]
        val fetches = input.toDF().toDF("b")
          .join(spark.read.parquet(stage), Seq("b"))
          .select(col("doc_id"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"),
            Html.syntheticPage(col("text"), col("source")).as("html"))
        val q = graft.streaming.IngestCrawl.crawledIngest(fetches, None, dir,
          graft.queries.DataOps.blockedDomains, settleEvery = 16,
          fetchedDir = Some(fetchedDir), recrawlScope = Some(due),
          recrawlSnapshotDir = Some(snapDir))
        val perBatch =
          try (0 until nBatches).map { i =>
            val t0 = System.nanoTime()
            input.addData(i)
            q.processAllAvailable()
            val dt = (System.nanoTime() - t0) / 1e9
            System.err.println(
              f"REHEARSAL crawl_stream_recrawl batch=$i sec=$dt%.2f")
            dt
          }.toVector
          finally q.stop()
        val early = perBatch.slice(2, 10)
        val late = perBatch.slice(perBatch.size - 8, perBatch.size)
        System.err.println(f"REHEARSAL crawl_stream_recrawl early_mean=${
          early.sum / early.size}%.2f late_mean=${late.sum / late.size}%.2f")
        graft.streaming.Frontier.readLayered(spark, fetchedDir).count()
      }},
      // the in-document canonical alias ledger at scale
      // (ds_crawl_canonical's shape, r19): page synth + gated
      // canonical extraction (a per-page projection), the declared
      // frame DISTINCT (corpus-fraction-sized — ~30% of pages
      // declare), the crawled-membership semi-join with NO broadcast
      // hint (AQE decides), and the admit-once fold as a keyed min +
      // join-back (the window form makes a partition per shared
      // target — host-sized for a popular hub). Expected ≈ the crawl
      // composite's extraction pass + two keyed exchanges over the
      // declared fraction per decade
      "crawl_canonical" -> { () => {
        import graft.operators.{Html, Urls}
        val blocked = graft.queries.DataOps.blockedDomains
        val d = docsR.repartition(32)
        val minDoc = d.groupBy(col("source"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("source"), Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("target"))
        val pages = d.join(broadcast(minDoc), Seq("source"))
          .select(
            Urls.canonicalize(Urls.syntheticUrl(col("doc_id"),
              col("source"))).as("requested_canon"),
            graft.queries.Crawl.canonicalPage(col("doc_id"), col("text"),
              col("source"), col("target")).as("html"))
        val ext = org.apache.spark.sql.GraftBridge.stageLocal(pages
          .select(col("requested_canon"),
            Html.canonicalHref(col("html")).as("href")))
        val declared = ext
          .filter(col("href").isNotNull)
          .filter(!Urls.hostBlocked(Urls.hostOf(col("requested_canon")),
            blocked))
          .select(col("requested_canon"),
            Urls.canonicalize(Urls.resolveHref(col("requested_canon"),
              col("href"))).as("final_canon"))
          .filter(col("final_canon").isNotNull &&
            col("final_canon") =!= col("requested_canon"))
          .distinct()
        val t = org.apache.spark.sql.GraftBridge.stageLocal(declared)
        val corpusUrls = d.select(Urls.canonicalize(
          Urls.syntheticUrl(col("doc_id"), col("source"))).as("url"))
        val fetchedFinals = corpusUrls
          .join(t.select(col("final_canon").as("url")), Seq("url"),
            "left_semi")
          .select(col("url").as("final_canon")).distinct()
        val minreq = t.groupBy("final_canon")
          .agg(min(col("requested_canon")).as("__minreq"))
        t.join(fetchedFinals.withColumn("__f", lit(true)),
            Seq("final_canon"), "left")
          .join(minreq, Seq("final_canon"))
          .select(when(coalesce(col("__f"), lit(false)), "dup_fetched")
            .when(col("requested_canon") === col("__minreq"), "admitted")
            .otherwise(lit("dup_alias")).as("verdict"))
          .groupBy("verdict").agg(count(lit(1)).as("n"))
          // coalesce: sum over zero rows is NULL — an empty verdict
          // frame must return 0, not NPE the harness (r20, ADVICE)
          .agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
      }},
      // the mega-host politeness question (r19 — the r18 verdict's
      // watch item): politeWavesCapped ranks per host in ONE window
      // partition, so a host owning ~90% of a wide frontier
      // serializes into one external-sorted task. Semantically
      // per-host order IS sequential; the measurement decides whether
      // the straggler dominates enough to justify a bucketed
      // pre-rank. 10k × mult candidates, 90% on one host, priorities
      // salted so the sort is honest.
      "polite_megahost" -> { () => {
        import graft.operators.Urls
        val n = 10000L * mult
        val cand = spark.range(n).select(
          when(pmod(col("id"), lit(10L)) < 9,
            concat(lit("https://megahost.example.com/p/"), col("id")))
            .otherwise(concat(lit("https://tail"),
              pmod(col("id"), lit(1000L)),
              lit(".example.com/p/"), col("id"))).as("url"),
          pmod(col("id") * 2654435761L, lit(100000L)).as("n_refs"))
        val caps = spark.range(1)
          .select(lit("megahost.example.com").as("host"), lit(4L).as("cap"))
        val sched = Urls.politeWavesCapped(cand, col("url"), col("n_refs"),
          caps, graft.queries.Crawl.crawlPerHostPerWave)
        sched.agg(count(lit(1)), max(col("wave")), sum(col("wave")))
          .collect()(0).getLong(0)
      }},
      // the decomposed rank on the SAME mega-host frontier: range
      // slices + per-slice rank + prefix offsets
      // (Urls.politeWavesCappedWide) — the fix polite_megahost prices
      "polite_megahost_wide" -> { () => {
        import graft.operators.Urls
        val n = 10000L * mult
        val cand = spark.range(n).select(
          when(pmod(col("id"), lit(10L)) < 9,
            concat(lit("https://megahost.example.com/p/"), col("id")))
            .otherwise(concat(lit("https://tail"),
              pmod(col("id"), lit(1000L)),
              lit(".example.com/p/"), col("id"))).as("url"),
          pmod(col("id") * 2654435761L, lit(100000L)).as("n_refs"))
        val caps = spark.range(1)
          .select(lit("megahost.example.com").as("host"), lit(4L).as("cap"))
        val sched = Urls.politeWavesCappedWide(cand, col("url"),
          col("n_refs"), caps, graft.queries.Crawl.crawlPerHostPerWave)
        sched.agg(count(lit(1)), max(col("wave")), sum(col("wave")))
          .collect()(0).getLong(0)
      }},
      // the balanced control for polite_megahost: the SAME volume
      // spread uniformly over 1000 hosts — the delta between the two
      // rows is the skew tax of the single-host window partition
      "polite_balanced" -> { () => {
        import graft.operators.Urls
        val n = 10000L * mult
        val cand = spark.range(n).select(
          concat(lit("https://tail"), pmod(col("id"), lit(1000L)),
            lit(".example.com/p/"), col("id")).as("url"),
          pmod(col("id") * 2654435761L, lit(100000L)).as("n_refs"))
        val caps = spark.range(1)
          .select(lit("tail0.example.com").as("host"), lit(4L).as("cap"))
        val sched = Urls.politeWavesCapped(cand, col("url"), col("n_refs"),
          caps, graft.queries.Crawl.crawlPerHostPerWave)
        sched.agg(count(lit(1)), max(col("wave")), sum(col("wave")))
          .collect()(0).getLong(0)
      }},
      // the discovery half at scale (ds_crawl_frontier's shape over
      // the replicated corpus): synth pages → link explode (bounded
      // by links/page) → resolve+canon projection → blocklist →
      // anti-join against the crawled set → in-link rollup. Expected
      // ≲ linear per decade: the explode is link-volume, the
      // anti-join and rollup key on the canonical URL
      "crawl_frontier" -> { () => {
        import graft.operators.{Html, Urls}
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        // crawled = distinct referrers (pruning drops the synth here;
        // r16: unfiltered — the post-agg host gate absorbs it)
        val crawled = pagesF.select(col("referrer").as("url")).distinct()
        val frontier = pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url")
          .agg(count(lit(1)).as("n_refs"), min(col("referrer")).as("fr"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")),
            graft.queries.DataOps.blockedDomains))
        frontier.agg(count(lit(1)), sum(col("n_refs")),
          sum(length(col("fr")))).collect()(0).getLong(0)
      }},
      // OPIC one-round cash receipts at scale (ds_frontier_opic's
      // shape): the same discovery chain plus ONE window keyed on the
      // referrer (outdegree) and the receipts aggregate keyed on the
      // target — both link-volume exchanges. Expected: ≈ the frontier
      // case + the window's referrer-keyed exchange per decade; the
      // hosts-bounded hub frame is noise at every scale
      "frontier_opic" -> { () => {
        import graft.operators.{Html, Urls}
        import org.apache.spark.sql.expressions.Window
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val crawled = pagesF.select(col("referrer").as("url")).distinct()
        val hub = d
          .select(concat(lower(col("source")), lit(".example.com")).as("host"),
            col("source")).distinct()
          .select(col("host"),
            explode(concat(
              array(lit(""), lit("/about"), lit("/legal")),
              slice(array(lit("/junk/0"), lit("/junk/1"), lit("/junk/2")),
                lit(1), pmod(length(col("source")), lit(4)).cast("int"))))
              .as("path"))
          .select(concat(lit("https://"), col("host"), lit("/hub")).as("referrer"),
            concat(lit("https://"), col("host"), col("path")).as("url"))
        val opic = pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .unionByName(hub)
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")),
            graft.queries.DataOps.blockedDomains))
          .withColumn("outdeg",
            count(lit(1)).over(Window.partitionBy("referrer")))
          .withColumn("cash",
            expr(s"${graft.queries.Crawl.opicCash}L div outdeg"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url")
          .agg(count(lit(1)).as("n_refs"), sum(col("cash")).as("cash"))
        opic.agg(count(lit(1)), sum(col("n_refs")), sum(col("cash")))
          .collect()(0).getLong(0)
      }},
      // the trap audit + gate at scale (ds_crawl_traps +
      // ds_frontier_gated's shape): the frontier chain + planted
      // calendar candidates → (host, template) fan-out aggregate →
      // broadcast anti-join gate. Expected: ≈ the frontier case +
      // one hosts×templates-bounded aggregate per decade
      "crawl_traps" -> { () => {
        import graft.operators.{Html, Urls}
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val crawled = pagesF.select(col("referrer").as("url")).distinct()
        val frontier = pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url").agg(count(lit(1)).as("n_refs"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")),
            graft.queries.DataOps.blockedDomains))
        val planted = d
          .select(concat(lower(col("source")), lit(".example.com")).as("host"),
            col("source")).distinct()
          .select(col("host"),
            (pmod(length(col("source")), lit(4)) * 20).cast("int").as("tn"))
          .select(col("host"),
            explode(when(col("tn") > 0, sequence(lit(0), col("tn") - 1))
              .otherwise(array())).as("k"))
          .select(concat(lit("https://"), col("host"), lit("/cal?d="),
            col("k")).as("url"), lit(1L).as("n_refs"))
        // staged ONCE (candidates-bounded): the audit aggregate and
        // the gate's left side both consume it — unstaged, the whole
        // frontier derivation re-ran per consumer (15.5 s vs ~8 s at
        // mult=1, the dsCrawlPolite lesson again)
        val cand = org.apache.spark.sql.GraftBridge.stageLocal(
          frontier.unionByName(planted)
            .withColumn("host", Urls.hostOf(col("url")))
            .withColumn("template",
              graft.queries.Crawl.urlTemplate(col("url"))))
        val traps = cand.groupBy("host", "template")
          .agg(count(lit(1)).as("n_urls"))
          .filter(col("n_urls") >= graft.queries.Crawl.trapMinUrls)
          .select("host", "template")
        val gated = cand.join(broadcast(traps),
          Seq("host", "template"), "left_anti")
        gated.agg(count(lit(1)), sum(col("n_refs")), sum(length(col("url"))))
          .collect()(0).getLong(0)
      }},
      // THE production wave at scale (ds_crawl_wave's shape): frontier
      // ∪ sitemap seeds ∪ trap bait → trap gate → fetch-ledger domain
      // gate → agent robots → agent delay caps. Expected: ≈ the
      // frontier derivation + the ledger pass (the crawl composite's
      // extraction over winners) per decade — every gate frame is
      // hosts/template-bounded
      "crawl_wave" -> { () => crawlWaveCase(false) },
      "crawl_wave_fresh" -> { () => crawlWaveCase(true) },
      // recrawl scheduling at scale (ds_recrawl's shape): the
      // url_dedup exchange with a count-distinct-md5 riding the same
      // map-side partials. Expected: ≈ url_dedup + the per-task
      // distinct-hash state per decade
      "recrawl" -> { () => {
        import graft.operators.Urls
        val fetches = docsR.repartition(32)
          .select(col("doc_id"), col("text"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h"),
            Urls.canonicalize(col("url")).as("canon_url"))
        val sched = fetches.groupBy("canon_url")
          .agg(count(lit(1)).as("n_fetches"),
            countDistinct(col("h")).as("n_variants"),
            min(col("doc_id")).as("keeper_id"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
            graft.queries.DataOps.blockedDomains))
          .withColumn("interval_waves",
            when(col("n_variants") >= 3, 1L)
              .when(col("n_variants") === 2, 4L)
              .when(col("n_fetches") >= 2, 64L)
              .otherwise(8L))
        sched.agg(count(lit(1)), sum(col("interval_waves")),
          sum(col("n_variants"))).collect()(0).getLong(0)
      }},
      // the lastmod override at scale (ds_recrawl_lastmod's shape):
      // the recrawl ladder LEFT-JOINed with a broadcast lastmod frame
      // (hosts × sitemap entries — structural). Expected ≈ recrawl +
      // ε at every decade: the protocol signal never touches the
      // ×MULT ledger volume beyond one broadcast join
      "recrawl_lastmod" -> { () => {
        import graft.operators.Urls
        val fetches = docsR.repartition(32)
          .select(col("doc_id"), col("text"), col("source"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("doc_id"), col("source"),
            md5(col("text").cast("binary")).as("h"),
            Urls.canonicalize(col("url")).as("canon_url"))
        val ladder = fetches.groupBy("canon_url")
          .agg(count(lit(1)).as("n_fetches"),
            countDistinct(col("h")).as("n_variants"),
            min(col("doc_id")).as("keeper_id"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
            graft.queries.DataOps.blockedDomains))
          .withColumn("interval_waves",
            when(col("n_variants") >= 3, 1L)
              .when(col("n_variants") === 2, 4L)
              .when(col("n_fetches") >= 2, 64L)
              .otherwise(8L))
        val hostsF = docsR.select(concat(lower(col("source")),
            lit(".example.com")).as("host"), col("source")).distinct()
        val meta = Urls.sitemapMeta(
            hostsF.select(col("host"),
              Urls.syntheticSitemap(col("source")).as("xml")),
            col("host"), col("xml"))
          .filter(col("kind") === "urlset" && col("lastmod").isNotNull)
          .select(Urls.canonicalize(col("loc_url")).as("canon_url"),
            col("lastmod").cast("date").as("lastmod"))
          .groupBy("canon_url").agg(max(col("lastmod")).as("lastmod"))
        val due = ladder.join(broadcast(meta), Seq("canon_url"), "left")
          .withColumn("last_fetch",
            when(length(Urls.hostOf(col("canon_url"))) % 2 === 0,
              lit("2024-01-15")).otherwise(lit("2024-02-14")).cast("date"))
          .withColumn("due_now",
            col("lastmod").isNotNull && col("lastmod") > col("last_fetch"))
        due.agg(count(lit(1)), sum(col("interval_waves")),
          sum(when(col("due_now"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
      }},
      // the alias-aware frontier gate at scale
      // (ds_frontier_redirects' shape): the frontier + planted moved-
      // namespace candidates → 3-hop follow walk → final canon → the
      // crawled-membership probe for the REDIRECTING subset only
      // (corpus semi-joins its broadcast finals). Expected ≈
      // crawl_frontier + ε: the walk and gate touch the structural
      // candidate set; the one ×MULT term beyond the frontier's own
      // is the corpus-side semi-join scan
      "frontier_redirects" -> { () => {
        import graft.operators.{Html, Urls}
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val crawled = pagesF.select(col("referrer").as("url")).distinct()
        val frontier = pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url").agg(count(lit(1)).as("n_refs"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")),
            graft.queries.DataOps.blockedDomains))
        val minTarget = d.groupBy(col("source"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("target"))
        val hostsF = d.select(concat(lower(col("source")),
            lit(".example.com")).as("host")).distinct()
        val planted = minTarget.select(regexp_replace(col("target"),
            "^([a-z][a-z0-9+.-]*://[^/?#]+)/", "$1/old/").as("url"))
          .unionByName(hostsF.select(concat(lit("https://"),
            col("host"), lit("/old/fresh")).as("url")))
          .select(Urls.canonicalize(col("url")).as("url"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("url"), lit(1L).as("n_refs"))
        val cand = frontier.unionByName(planted)
          .groupBy("url").agg(max(col("n_refs")).as("n_refs"))
        val (fin, _) = Urls.followRedirects(col("url"))
        val followed = org.apache.spark.sql.GraftBridge.stageLocal(
          cand.withColumn("final_canon", Urls.canonicalize(fin)))
        val redirecting = followed.filter(col("final_canon") =!= col("url"))
        val direct = followed.filter(col("final_canon") === col("url"))
        val corpusUrls = d.select(Urls.canonicalize(
          Urls.syntheticUrl(col("doc_id"), col("source"))).as("url"))
        val fetchedFinals = corpusUrls
          .join(broadcast(redirecting.select(col("final_canon").as("url"))),
            Seq("url"), "left_semi")
          .select(col("url").as("final_canon")).distinct()
        direct.unionByName(
            redirecting.join(broadcast(fetchedFinals),
              Seq("final_canon"), "left_anti"))
          .agg(count(lit(1)), sum(col("n_refs")))
          .collect()(0).getLong(0)
      }},
      // the composed politeness front door at scale (ds_crawl_polite's
      // shape): the frontier of crawl_frontier STAGED once (bounded by
      // host × path variety — structural, not volumetric), robots
      // rules parsed from the per-host synthetic bodies (bounded by
      // hosts), access-filtered, then delay-capped waves. Expected:
      // the decade lands entirely in the frontier derivation; the
      // staged gate + window run over the structural candidate set
      "crawl_polite" -> { () => {
        import graft.operators.{Html, Urls}
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val crawled = pagesF.select(col("referrer").as("url")).distinct()
        val frontier = pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url").agg(count(lit(1)).as("n_refs"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")),
            graft.queries.DataOps.blockedDomains))
        val staged = org.apache.spark.sql.GraftBridge.stageLocal(frontier)
        val hosts = d.select(concat(lower(col("source")),
            lit(".example.com")).as("host"), col("source")).distinct()
        val rules = Urls.robotsRules(hosts, col("host"),
          Urls.syntheticRobots(col("source")))
        val caps = Urls.robotsDelays(hosts, col("host"),
            Urls.syntheticRobots(col("source")))
          .select(col("host"), greatest(lit(1L),
            floor(lit(graft.queries.Crawl.crawlWavePeriodSec) /
              col("delay_s"))).as("cap"))
        val polite = Urls.politeWavesCapped(
          Urls.robotsFilter(staged, col("url"), rules),
          col("url"), col("n_refs"), caps,
          graft.queries.Crawl.crawlPerHostPerWave)
        polite.agg(count(lit(1)), sum(col("wave")), max(col("cap")))
          .collect()(0).getLong(0)
      }},
      // the seeded politeness composite at scale (dsCrawlPoliteSeeded
      // 's shape): crawl_polite PLUS the staged crawled set, the
      // sitemap-seed union at evidence 0 and the fetched-seed
      // exclusion. The claim under test: the seed machinery costs ~ε
      // over crawl_polite — seeds are hosts-bounded (structural, not
      // volumetric), and the exclusion SEMI-joins the corpus against
      // the broadcast seed set instead of shuffling the corpus
      "crawl_polite_seeded" -> { () => {
        import graft.operators.{Html, Urls}
        val blocked = graft.queries.DataOps.blockedDomains
        val d = docsR.repartition(32)
        val pagesF = d.select(
          Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("referrer"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val crawled = org.apache.spark.sql.GraftBridge.stageLocal(
          pagesF.select(col("referrer").as("url")).distinct())
        val frontier = org.apache.spark.sql.GraftBridge.stageLocal(pagesF
          .select(col("referrer"),
            explode(Html.linkHrefs(col("html"))).as("href"))
          .filter(Urls.hrefIsCandidate(col("href")))
          .select(col("referrer"),
            Urls.resolveHref(col("referrer"), col("href")).as("raw_url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("raw_url")),
            blocked))
          .select(col("referrer"), Urls.canonicalize(col("raw_url")).as("url"))
          .join(crawled, Seq("url"), "left_anti")
          .groupBy("url").agg(count(lit(1)).as("n_refs"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("url")), blocked)))
        val hosts = d.select(concat(lower(col("source")),
            lit(".example.com")).as("host"), col("source")).distinct()
        val locs = hosts.select(explode(
            Urls.sitemapLocs(Urls.syntheticSitemap(col("source")))).as("loc"))
          .select(Urls.canonicalize(col("loc")).as("url")).distinct()
        val planted = d.groupBy(col("source"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(Urls.canonicalize(
            Urls.syntheticUrl(col("doc_id"), col("source"))).as("url"))
        val seeds = locs.unionByName(planted)
        val fetchedSeeds = crawled
          .join(broadcast(seeds), Seq("url"), "left_semi").distinct()
        val live = seeds.join(fetchedSeeds, Seq("url"), "left_anti")
        val cand = frontier
          .unionByName(live.select(col("url"), lit(0L).as("n_refs")))
          .groupBy("url").agg(max(col("n_refs")).as("n_refs"))
        val rules = Urls.robotsRules(hosts, col("host"),
          Urls.syntheticRobots(col("source")))
        val caps = Urls.robotsDelays(hosts, col("host"),
            Urls.syntheticRobots(col("source")))
          .select(col("host"), greatest(lit(1L),
            floor(lit(graft.queries.Crawl.crawlWavePeriodSec) /
              col("delay_s"))).as("cap"))
        val polite = Urls.politeWavesCapped(
          Urls.robotsFilter(cand, col("url"), rules),
          col("url"), col("n_refs"), caps,
          graft.queries.Crawl.crawlPerHostPerWave)
        polite.agg(count(lit(1)), sum(col("wave")), max(col("cap")))
          .collect()(0).getLong(0)
      }},
      // the domain-quality gate at scale (ds_host_quality's shape):
      // the full crawl front door, then ONE host-keyed aggregate over
      // the winners. Host cardinality is structural (sources), so the
      // expected decade curve is the crawl composite's plus ~ε — the
      // row prices the gate where it actually runs
      "host_quality" -> { () => {
        import graft.operators.{Html, Urls}
        val d = docsR.repartition(32)
        val winners = d
          .select(col("doc_id"), col("source"), col("text"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("doc_id"), col("source"), col("text"),
            Urls.canonicalize(col("url")).as("canon_url"))
          .groupBy("canon_url")
          .agg(min(struct(col("doc_id"), col("source"), col("text"))).as("w"),
            count(lit(1)).as("n_fetches"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("canon_url"), col("n_fetches"),
            col("w.doc_id").as("doc_id"), col("w.source").as("source"),
            col("w.text").as("text"))
        val pages = winners.select(col("doc_id"), col("canon_url"),
          col("n_fetches"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val ext = Html.extractMainText(pages, col("html"), col("doc_id"),
          carry = Seq(col("canon_url"), col("n_fetches")),
          dropNullHtml = false)
        val nTok = when(col("main_text") === "", 0L)
          .otherwise(size(split(col("main_text"), "[ \\n]")).cast("long"))
        val hq = ext.select(
            Urls.hostOf(col("canon_url")).as("host"), col("n_fetches"),
            nTok.as("n_tokens"),
            when(nTok >= graft.queries.Crawl.crawlMinTokens, 1L)
              .otherwise(0L).as("k"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_pages"), sum(col("k")).as("n_kept"),
            sum(col("n_fetches")).as("nf"), sum(col("n_tokens")).as("st"))
          .withColumn("quality_ok", col("n_kept") * 2 >= col("n_pages"))
        hq.agg(count(lit(1)), sum(col("nf")), sum(col("st")),
            sum(when(col("quality_ok"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
      }},
      // the gate-first curation composite at scale (ds_curate_domain's
      // shape): crawl verdicts → host-window domain gate → the full
      // repetition/LM/dedup audit over the SURVIVORS. Expected: the
      // audit dominates (it is the pipeline case's cost over a gated
      // subset); the gate itself adds one host window
      "curate_domain" -> { () => {
        import graft.operators.{Html, Urls, Curation}
        import org.apache.spark.sql.expressions.Window
        val d = docsR.repartition(32)
        val winners = d
          .select(col("doc_id"), col("source"), col("text"),
            Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .filter(!Urls.hostBlocked(Urls.rawHostLower(col("url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("doc_id"), col("source"), col("text"),
            Urls.canonicalize(col("url")).as("canon_url"))
          .groupBy("canon_url")
          .agg(min(struct(col("doc_id"), col("source"), col("text"))).as("w"))
          .filter(!Urls.hostBlocked(Urls.hostOf(col("canon_url")),
            graft.queries.DataOps.blockedDomains))
          .select(col("canon_url"), col("w.doc_id").as("doc_id"),
            col("w.source").as("source"), col("w.text").as("text"))
        val pages = winners.select(col("doc_id"), col("canon_url"),
          Html.syntheticPage(col("text"), col("source")).as("html"))
        val ext = Html.extractMainText(pages, col("html"), col("doc_id"),
          carry = Seq(col("canon_url")), dropNullHtml = false)
        val nTok = when(col("main_text") === "", 0L)
          .otherwise(size(split(col("main_text"), "[ \\n]")).cast("long"))
        val hw = Window.partitionBy("host")
        val g = ext.select(col("doc_id"),
            Urls.hostOf(col("canon_url")).as("host"),
            when(nTok >= graft.queries.Crawl.crawlMinTokens, 1L)
              .otherwise(0L).as("k"))
          .withColumn("domain_ok",
            sum(col("k")).over(hw) * 100 >=
              count(lit(1)).over(hw) * graft.queries.Crawl.domainKeepPct)
        val survivors = d
          .join(g.filter(col("domain_ok") && col("k") === 1L)
            .select("doc_id"), Seq("doc_id"))
          .select(col("doc_id"), col("text"))
        val ref = d.filter(col("source")
          .isin(graft.queries.DataOps.lmRefSources: _*))
        // NLL cap disabled at scale like the `curate` case: add-one
        // smoothing inflates NLL with the ×MULT salted vocabulary, so
        // the corpus-calibrated cap would verdict every survivor 'lm'
        // and the decade row would measure a one-branch plan (caught
        // live: verdict classes collapsed to 1 at 1000×). The LM
        // gate's scoring cost still runs in full.
        Curation.audit(survivors, col("text"), col("doc_id"), ref, 3,
            graft.queries.DataOps.jaccardThreshold,
            graft.queries.DataOps.curateMaxTop2,
            graft.queries.DataOps.curateMaxDup5,
            maxAvgNll = 1e9)
          .groupBy("verdict").agg(count(lit(1)).as("n"))
          .agg(count(lit(1)), sum(col("n"))).collect()(0).getLong(0)
      }},
      // attribution probe for html_extract: the page-furniture
      // synthesis alone (3 regex passes + concat, consumed via
      // length-sum) — subtracting this from html_extract isolates
      // the kernel's own share of the decade row
      "html_synth" -> { () =>
        val pages = docsR.repartition(32).select(col("doc_id"),
          graft.operators.Html.syntheticPage(col("text"), col("source")).as("html"))
        pages.agg(count(lit(1)), sum(length(col("html"))))
          .collect()(0).getLong(0)
      },
      // URL canonicalize + keep-first dedup: the cascade is a
      // projection; the ONE shuffle is the keep-first groupBy on the
      // canonical URL with map-side min/count partials — expected
      // ≲ linear per decade (shuffle rows ≈ distinct URLs/task)
      "url_dedup" -> { () => {
        val urls = docsR.repartition(32).select(col("doc_id"),
          graft.operators.Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
        graft.operators.Urls.dedupByUrl(urls, col("url"), col("doc_id"),
          graft.queries.DataOps.blockedDomains).count()
      }},
      // attribution probes for url_dedup: the synth+canon projection
      // alone (consumed via length-sum so pruning can't skip it), and
      // synth alone — their difference isolates the cascade's cost
      // outside any aggregate stage
      "url_canon_probe" -> { () => {
        val urls = docsR.repartition(32).select(col("doc_id"),
          graft.operators.Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
        urls.select(graft.operators.Urls.canonicalize(col("url")).as("c"))
          .agg(sum(length(col("c")))).collect()(0).getLong(0)
      }},
      "url_synth_probe" -> { () =>
        docsR.repartition(32).select(
            graft.operators.Urls.syntheticUrl(col("doc_id"), col("source")).as("url"))
          .agg(sum(length(col("url")))).collect()(0).getLong(0)
      },
      "simhash_32_8" -> { () =>
        Dedup.simhashPairs(docsR, col("text"), col("doc_id")).count()
      },
      "simhash_64_16" -> { () =>
        Dedup.simhashPairs(docsR, col("text"), col("doc_id"), bits = 64, bandBits = 16).count()
      },
      // decomposition probes: fingerprint aggregation alone, per
      // width. The fingerprint MUST be consumed (sum of a residue) —
      // under a bare count() Catalyst column-prunes the kernel out of
      // the plan entirely and the case times only the scan (the same
      // trap rep_ngrams hit with its left joins; the r12-recorded
      // 3.2 s @100x row measured exactly that and is corrected below)
      "simhash_fp_32" -> { () =>
        Dedup.simhash(docsR, col("text"), col("doc_id"), 32)
          .agg(count(lit(1)), sum(pmod(col("simhash"), lit(1000003L))))
          .collect()(0).getLong(0)
      },
      "simhash_fp_64" -> { () =>
        Dedup.simhash(docsR, col("text"), col("doc_id"), 64)
          .agg(count(lit(1)), sum(pmod(col("simhash"), lit(1000003L))))
          .collect()(0).getLong(0)
      },
      // raw band-join candidate volume (pre-distinct, pre-filter)
      "simhash_cand_32_8" -> { () => simhashCandidates(docsR, 32, 8) },
      "simhash_cand_64_16" -> { () => simhashCandidates(docsR, 64, 16) })

    val selected = cases.filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, run) =>
      val (rows, sec) = timed(name)(run())
      // consume boundary: the case's count()/collect() materialized
      // everything — drop any stageLocal checkpoint blocks before the
      // next case (at 1000× a staged frame is GBs of dead spill)
      org.apache.spark.sql.GraftBridge.releaseStaged()
      System.err.println(f"REHEARSAL $name mult=$mult rows=$rows sec=$sec%.2f")
      s""""$name":{"rows":$rows,"sec":$sec}"""
    }
    println(s"""{"metric":"rehearsal","mult":$mult,"sf":"$sfDir","cases":${results.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
