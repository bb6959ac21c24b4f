package graft.operators

import graft.SparkSpec
import graft.queries.DataOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level prefix sum must (a) equal the single-window global
  * cumsum exactly, (b) keep the single-partition exchange confined to
  * the O(#blocks) summary frame — the full table must flow through a
  * block-partitioned window only — and (c) pack shards that respect
  * the greedy budget bound.
  */
class ShardingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Final adaptive plan only (the AQE toString appends the initial
    * plan, which would double-count exchanges). */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
  }

  test("globalCumsum equals the naive single-partition window") {
    import spark.implicits._
    // keys deliberately sparse + unordered input, several block spans
    val rows = new scala.util.Random(7).shuffle(
      (0 until 500).map(i => (i.toLong * 7, (i % 13 + 1).toLong)).toList)
    val df = rows.toDF("k", "v")
    val got = Sharding.globalCumsum(df, "k", col("v"), blockSize = 100)
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy("k")))
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("only the block-summary frame crosses a single-partition exchange") {
    val df = DataOps.dsPackShards(spark, sf)
    val p = finalPlan(df)
    // the tiny offsets window is allowed exactly one; a second one
    // would mean the full table collapsed into one task
    assert(p.sliding("Exchange SinglePartition".length)
      .count(_ == "Exchange SinglePartition") == 1, s"plan:\n$p")
    // the full-table window is keyed on the block id — parallel by layout
    assert(p.contains("windowspecdefinition(__blk"),
      s"full-table window must partition by __blk:\n$p")
  }

  test("groupedCumsum equals the naive per-group window") {
    import spark.implicits._
    val rows = new scala.util.Random(11).shuffle(
      (0 until 600).map(i => (s"g${i % 7}", i.toLong * 3, (i % 11 + 1).toLong)).toList)
    val df = rows.toDF("g", "k", "v")
    val got = Sharding.groupedCumsum(df, "g", "k", col("v"), blockSize = 50)
      .select("g", "k", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.partitionBy("g").orderBy("k")))
      .select("g", "k", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("mix sampling: per-group budgeted prefix, no single-partition exchange") {
    val df = DataOps.dsMix(spark, sf)
    val p = finalPlan(df)
    // neither the summary nor the full-table window may collapse to one
    // task — the offsets window partitions by the group
    assert(!p.contains("Exchange SinglePartition"), s"plan:\n$p")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_._2)
    bySource.foreach { case (src, rs) =>
      val budget = if (src.drop(3).toIntOption.exists(_ % 2 == 0)) 1000L else 500L
      // every kept row fits the budget, and the kept set is the exact
      // stable-order prefix: cum = running sum in doc_id order
      var run = 0L
      rs.sortBy(_._1).foreach { case (_, _, n, cum) =>
        run += n
        assert(cum == run, s"$src: not a contiguous prefix")
        assert(cum <= budget, s"$src overruns its budget")
      }
    }
    // the cut binds: at least one source uses most of its budget
    assert(bySource.exists { case (src, rs) =>
      val budget = if (src.drop(3).toIntOption.exists(_ % 2 == 0)) 1000L else 500L
      rs.map(_._3).sum > budget - 60
    })
  }

  test("shard sequences: ordered concat, one separator between docs, tokens add up") {
    val rows = DataOps.dsPackSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (sid, nDocs, tokens, seq) =>
      val docs = seq.split(" <eos> ", -1)
      assert(docs.length.toLong == nDocs, s"shard $sid separator count")
      assert(docs.map(_.split(" ").length.toLong).sum == tokens,
        s"shard $sid token sum")
    }
  }

  test("shard boundaries are append-stable: earlier rows keep (cum, shard_id)") {
    // a shard is its row's STARTING offset div budget, and appends only
    // ever add higher orderKeys — so every pre-append row must keep its
    // exact running total and shard id after a repack over the grown
    // corpus (the property that makes shards immutable artifacts)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    def pack(df: DataFrame) =
      Sharding.packShards(df, "doc_id", size(split(col("text"), " ")),
        DataOps.shardBudget, DataOps.shardBlock)
    val before = pack(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum"), r.getAs[Long]("shard_id")))).toMap
    val appended = docs.unionByName(
      docs.select((col("doc_id") + maxId + 1).as("doc_id"), col("text")))
    val after = pack(appended)
      .filter(col("doc_id") <= maxId)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum"), r.getAs[Long]("shard_id")))).toMap
    assert(after == before)
    assert(before.nonEmpty)
  }

  test("shard packing: stable order, budget bound, contiguous shard ids") {
    val rows = DataOps.dsPackShards(spark, sf)
      .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // cum is the running total in doc_id order
    var run = 0L
    rows.foreach { case (_, n, cum, _) => run += n; assert(cum == run) }
    // shard id = starting offset div budget: nondecreasing, starts at 0,
    // no gaps, and every shard's span holds its start offset
    assert(rows.head._4 == 0L)
    val perShard = rows.groupBy(_._4)
    (0L until perShard.keys.max).foreach(i => assert(perShard.contains(i), s"gap at shard $i"))
    rows.foreach { case (_, n, cum, sid) =>
      assert((cum - n) / DataOps.shardBudget == sid)
    }
    // greedy bound: a shard overflows the budget by at most one row
    perShard.foreach { case (sid, rs) =>
      val tokens = rs.map(_._2).sum
      val lastRow = rs.maxBy(_._3)
      assert(tokens <= DataOps.shardBudget + lastRow._2,
        s"shard $sid holds $tokens tokens, budget ${DataOps.shardBudget}")
    }
  }

  test("epoch shuffle: total permutations, epochs distinct, shards balanced") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Sharding.epochShuffle(docs, col("doc_id"),
        epochs = 2, numShards = 8, blocksPerEpoch = 16)
      .collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (_, rs) =>
      // a total permutation: every id exactly once, positions 1..N
      assert(rs.map(_._2).toSet == ids)
      assert(rs.map(_._3).sorted.toSeq == (1L to ids.size).toSeq)
      // round-robin shards differ in size by at most one
      val sizes = rs.groupBy(_._4).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
    }
    // the two epochs are genuinely different orders of the same corpus
    def order(e: Int) = byEpoch(e).sortBy(_._3).map(_._2).toSeq
    assert(order(0) != order(1))
    // deterministic: a second run reproduces positions bit-for-bit
    val again = Sharding.epochShuffle(docs, col("doc_id"),
        epochs = 2, numShards = 8, blocksPerEpoch = 16)
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(t => (t._1, t._3)).toSeq == out.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("length buckets: power-of-two caps, batch numbering, padding bill") {
    import spark.implicits._
    val docs = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L),
      (6L, 8L), (7L, 9L), (8L, 1024L), (9L, 1025L), (10L, 4L))
      .toDF("doc_id", "n")
    val out = Sharding.lengthBucketBatches(docs, col("doc_id"), col("n"),
        batchSize = 2, blockSize = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // exact powers land in their own cap, not the next one up
    assert(out(1L)._2 == 0L && out(1L)._4 == 0L)   // 1 → cap 1
    assert(out(2L)._2 == 1L && out(2L)._4 == 0L)   // 2 → cap 2
    assert(out(3L)._2 == 2L && out(3L)._4 == 1L)   // 3 → cap 4, pad 1
    assert(out(4L)._2 == 2L && out(4L)._4 == 0L)   // 4 → cap 4
    assert(out(6L)._2 == 3L && out(6L)._4 == 0L)   // 8 → cap 8
    assert(out(7L)._2 == 4L && out(7L)._4 == 7L)   // 9 → cap 16
    assert(out(8L)._2 == 10L && out(8L)._4 == 0L)  // 1024 → cap 1024
    assert(out(9L)._2 == 11L && out(9L)._4 == 1023L)
    // batch ids count in stable doc order within each bucket:
    // bucket 2 holds docs 3, 4, 10 → batches 0, 0, 1 at size 2
    assert(out(3L)._3 == 0L && out(4L)._3 == 0L && out(10L)._3 == 1L)
    // doc 5 (len 5) shares bucket 3 with doc 6 (len 8)
    assert(out(5L)._2 == 3L && out(5L)._3 == 0L && out(6L)._3 == 0L)
  }

  test("temperature mixing: α<1 flattens, α=1 is proportional, tiny sources uncapped") {
    import spark.implicits._
    // head source 10× the tail's tokens
    val docs = ((1 to 100).map(i => (i.toLong, "head", ("t " * 10).trim)) ++
      (101 to 110).map(i => (i.toLong, "tail", ("t " * 10).trim)))
      .toDF("doc_id", "source", "text")
    def rates(alpha: Double, budget: Long): Map[String, Long] =
      Sharding.mixByTemperature(docs, "source", col("doc_id"),
          size(split(col("text"), " ")), alpha, budget)
        .select("source", "rate_ppm").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=1: proportional — every source keeps the same fraction
    val p = rates(1.0, 550)
    assert(p("head") == p("tail") && p("head") == 500000L)
    // α=0.5: the tail's keep-rate must exceed the head's
    val f = rates(0.5, 550)
    assert(f("tail") > f("head"))
    // a budget beyond the corpus caps every rate at 100%
    assert(rates(0.7, 100000).values.toSet == Set(1000000L))
  }

  test("temperature mixing membership is exactly the hash threshold") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"s${i % 3}", ("w " * (i % 20 + 1)).trim))
      .toDF("doc_id", "source", "text")
    val out = Sharding.mixByTemperature(docs, "source", col("doc_id"),
        size(split(col("text"), " ")), 0.7, 800)
    val rates = out.select("source", "rate_ppm").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.withColumn("h",
        graft.functions.VectorFunctions.tokenHash(col("doc_id").cast("string"))
          % 1000000L)
      .collect()
      .filter(r => r.getAs[Long]("h") < rates(r.getAs[String]("source")))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept == want && kept.nonEmpty && kept.size < 200)
  }

  test("fixed-length packing tiles the token stream exactly") {
    import spark.implicits._
    // lengths chosen to cross, land on, and fall inside boundaries
    val docs = Seq((1L, 5L), (2L, 2L), (3L, 9L), (4L, 1L), (5L, 14L))
      .toDF("doc_id", "n")
    val spans = Sharding.packFixedSequences(docs, "doc_id", col("n") - 1,
        seqLen = 8, blockSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3))
    val total = 5 + 2 + 9 + 1 + 14 // each doc's n includes its EOS here
    // sequences are exactly full except the last
    val bySeq = spans.groupBy(_._2).toSeq.sortBy(_._1)
    assert(bySeq.map(_._1) == (0L until (total + 7) / 8).toList)
    bySeq.foreach { case (sid, rs) =>
      val want = math.min(8L, total - sid * 8)
      assert(rs.map(_._4).sum == want, s"seq $sid length")
      // spans tile the sequence: offsets chain with no gap or overlap
      var off = 0L
      rs.foreach { case (_, _, o, n) => assert(o == off); off += n }
    }
    // each document's spans cover exactly its tokens, in order
    spans.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length) // one span per seq
      assert(rs.map(_._2).toSeq == (rs.head._2 to rs.last._2).toSeq) // contiguous
    }
    val perDoc = spans.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc == Map(1L -> 5L, 2L -> 2L, 3L -> 9L, 4L -> 1L, 5L -> 14L))
  }

  test("fixed-length packing is append-stable") {
    import spark.implicits._
    val base = Seq((1L, 7L), (2L, 13L), (3L, 4L)).toDF("doc_id", "n")
    def pack(df: org.apache.spark.sql.DataFrame) =
      Sharding.packFixedSequences(df, "doc_id", col("n"), 8, 2)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val before = pack(base)
    val after = pack(base.unionByName(Seq((9L, 20L)).toDF("doc_id", "n")))
    assert(before.forall { case (id, sp) => after(id) == sp })
  }

  test("curriculum stages equal the exact ntile, ranks are a permutation") {
    import spark.implicits._
    // difficulty with heavy ties; 23 rows across 5 stages (uneven split)
    val rows = (0 until 23).map(i => (i.toLong, ((i * 7) % 5 + 1).toLong))
    val df = rows.toDF("doc_id", "difficulty")
    val got = Sharding.curriculumStages(df, col("doc_id"), col("difficulty"),
        nStages = 5, idBits = 8, blockSize = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.values.map(_._2).toSeq.sorted == (1L to 23L))
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy("difficulty", "doc_id")).cast("long"))
      .withColumn("stage", ((col("rank") - 1) * 5 / 23).cast("long"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
  }

  test("curriculum: the corpus-wide window is block-keyed, not global") {
    val df = DataOps.dsCurriculum(spark, sf)
    val p = finalPlan(df)
    // exactly two single-partition stages, both over bounded frames:
    // the O(#blocks) offsets window and the O(1) corpus-count agg —
    // a third would mean the full table collapsed (the ntile shape)
    assert(p.sliding("Exchange SinglePartition".length)
      .count(_ == "Exchange SinglePartition") == 2, s"plan:\n$p")
    assert(p.contains("windowspecdefinition(__blk"),
      s"full-table window must partition by __blk:\n$p")
    assert(!p.contains("ntile"), s"ntile window must not appear:\n$p")
  }
}
