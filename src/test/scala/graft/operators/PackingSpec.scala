package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val budget = 256

  test("chunking is lossless: chunks reassemble to the original token stream") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Packing.chunkTokens(docs, "doc_id", "text", chunkSize = 32)
      .as[(Long, Int, String, Int)].collect()
    val original = docs.selectExpr("doc_id",
        "array_join(regexp_extract_all(text, '\\\\S+', 0), ' ') as t")
      .as[(Long, String)].collect().toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val ordered = cs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == cs.indices.toSeq) // dense chunk ids
      // every chunk is full except the last; reassembly is exact
      ordered.init.foreach(c => assert(c._4 == 32))
      assert(ordered.last._4 > 0 && ordered.last._4 <= 32)
      assert(ordered.map(_._3).mkString(" ") == original(id))
      assert(ordered.map(_._4).sum == original(id).split(" ").length)
    }
  }

  test("packing invariants hold over ScalaCheck-generated corpora and budgets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    (1 to 5).foreach { trial =>
      val nDocs = 20 + trial * 30
      val budget = Seq(16, 64, 256, 1000, 7)(trial - 1)
      val words = Gen.listOfN(nDocs, Gen.chooseNum(0, 40))(
        Gen.Parameters.default, Seed(trial.toLong)).get
      val docs = words.zipWithIndex.map { case (w, i) =>
        (i.toLong, Seq.fill(w)("tok").mkString(" "))
      }.toDF("doc_id", "text")
      val rows = Packing.packSequences(spark, docs, "doc_id", "text",
          tokenBudget = budget, nBuckets = 4)
        .as[(Long, Int, Long, Long, Int)].collect()
      assert(rows.length == nDocs)
      rows.groupBy(r => (r._2, r._4)).foreach { case (_, seqDocs) =>
        assert(seqDocs.map(_._3).sum <= budget || seqDocs.length == 1)
        assert(seqDocs.sortBy(_._5).map(_._5).toSeq == seqDocs.indices.toSeq)
      }
    }
  }

  test("null hygiene: null text packs/chunks as token-free; null id rows are dropped from packing") {
    val df = Seq[(java.lang.Long, String)]((1L, "a b c"), (2L, null), (null, "x y"))
      .toDF("doc_id", "text")
    val packed = Packing.packSequences(spark, df, "doc_id", "text", 256, 2)
      .as[(Long, Int, Long, Long, Int)].collect()
    assert(packed.map(_._1).toSet == Set(1L, 2L)) // null id dropped
    assert(packed.find(_._1 == 2L).get._3 == 0L)  // null text → 0 tokens
    val chunks = Packing.chunkTokens(df.filter($"doc_id".isNotNull), "doc_id", "text", 4)
      .as[(Long, Int, String, Int)].collect()
    val nullDoc = chunks.filter(_._1 == 2L)
    assert(nullDoc.length == 1 && nullDoc.head._3 == "" && nullDoc.head._4 == 0)
  }

  test("packing invariants: budget respected, positions contiguous, layout-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val packed = Packing.packSequences(spark, docs, "doc_id", "text",
      tokenBudget = budget, nBuckets = 8)
    val rows = packed.as[(Long, Int, Long, Long, Int)].collect()
    assert(rows.length == docs.count())

    rows.groupBy(r => (r._2, r._4)).foreach { case ((b, s), seqDocs) =>
      val total = seqDocs.map(_._3).sum
      // a sequence only exceeds the budget when it is a single oversized doc
      assert(total <= budget || seqDocs.length == 1,
        s"bucket $b seq $s holds $total tokens across ${seqDocs.length} docs")
      // positions are 0..n-1 in doc-id order
      val byPos = seqDocs.sortBy(_._5)
      assert(byPos.map(_._5).toSeq == seqDocs.indices.toSeq)
      assert(byPos.map(_._1).toSeq == seqDocs.map(_._1).sorted.toSeq)
    }
    // greedy: a doc opens a new sequence only because it would not fit
    rows.groupBy(_._2).foreach { case (_, bucketDocs) =>
      val inOrder = bucketDocs.sortBy(_._1)
      inOrder.sliding(2).foreach {
        case Array(prev, cur) if cur._4 == prev._4 + 1 && cur._5 == 0 =>
          val prevSeqTotal = inOrder.filter(_._4 == prev._4).map(_._3).sum
          assert(prevSeqTotal + cur._3 > budget)
        case _ =>
      }
    }
    // identical packing under a different input layout
    val re = Packing.packSequences(spark, docs.repartition(13), "doc_id", "text",
        tokenBudget = budget, nBuckets = 8)
      .as[(Long, Int, Long, Long, Int)].collect()
    assert(rows.sortBy(_._1).toSeq == re.sortBy(_._1).toSeq)
  }

  test("globalRank equals a single-reducer row_number, at any input layout") {
    // adversarial weights: many ties ACROSS the tiebreak (w = id % 7)
    val df = spark.range(5000)
      .select(col("id"), (col("id") % 7).as("w"))
    val expected = df.orderBy(col("w").desc, col("id"))
      .select("id").as[Long].collect().toSeq
    Seq(df, df.repartition(17)).foreach { d =>
      val got = Packing.globalRank(d, Seq(col("w").desc, col("id")))
        .orderBy(col("_rank"))
        .select(col("id"), col("_rank")).as[(Long, Long)].collect()
      assert(got.map(_._2).toSeq == (0L until 5000L).toSeq, "ranks must be dense 0..n-1")
      assert(got.map(_._1).toSeq == expected, "rank order must equal the total order")
    }
  }

  test("the offset pass reads the exchange PRE-sort (fast path engages, partitions align)") {
    // a silent fallback would restore the double per-partition sort —
    // correct but 2x the sort cost at 100 TB, so the engagement itself
    // is the asserted contract
    val df = spark.range(10000).select(col("id"), (col("id") % 7).as("w"))
    val sorted = df.repartitionByRange(col("w").desc, col("id"))
      .sortWithinPartitions(col("w").desc, col("id"))
    val (pre, fast) = Packing.preSortRdd(sorted)
    assert(fast, "pre-sort read must engage on the rank family's own plan shape")
    // same rows in the same partition indices as the sorted output
    val preCounts = pre.mapPartitionsWithIndex((i, it) => Iterator((i, it.size))).collect().toMap
    val postCounts = sorted.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size))).collect().toMap
    assert(preCounts == postCounts)
    assert(preCounts.values.sum == 10000)
  }

  test("epochOrder: dense permutation, distinct per epoch, replayable across layouts") {
    val docs = spark.range(3000).select(col("id").as("doc_id"))
    val e3 = Packing.epochOrder(docs, "doc_id", 3)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    // dense 0..n-1: a permutation, not a sparse rank
    assert(e3.values.toSeq.sorted == (0L until 3000L).toSeq)
    // a different epoch is a DIFFERENT permutation (the whole point:
    // fresh batch order per epoch) — identical ones would mean the
    // epoch salt isn't reaching the hash
    val e4 = Packing.epochOrder(docs, "doc_id", 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e3 != e4)
    // replay after a "restart" from a different physical layout: the
    // exact same permutation
    val re = Packing.epochOrder(docs.repartition(13), "doc_id", 3)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e3 == re)
  }

  test("cumulativeByRank == single-reducer window cumsum; selectByBudget keeps the exact frontier") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(2000).select(col("id"), ((col("id") * 37) % 100 + 1).as("w"))
    val expected = df.withColumn("cum",
        sum(col("w")).over(Window.orderBy(col("w").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    Seq(df, df.repartition(17)).foreach { d =>
      val got = Packing.cumulativeByRank(d, Seq(col("w").desc, col("id")), "w")
        .select(col("id"), col("_cum")).as[(Long, Long)].collect().toMap
      assert(got == expected, "distributed prefix sum must equal the one-window cumsum")
    }
    // budget frontier: inclusive — the row that lands exactly ON the
    // budget stays, the next is cut
    val total = df.agg(sum("w")).as[Long].head()
    val budget = total / 3
    val kept = Packing.selectByBudget(df, Seq(col("w").desc, col("id")), "w", budget)
      .select("id").as[Long].collect().toSet
    val expectKept = expected.filter(_._2 <= budget).keySet
    assert(kept == expectKept)
    // a budget exactly equal to some row's cum keeps that row
    val boundary = expected.values.toSeq.sorted.apply(42)
    val keptB = Packing.selectByBudget(df, Seq(col("w").desc, col("id")), "w", boundary)
      .count()
    assert(keptB == 43, s"inclusive frontier: expected 43 rows, got $keptB")
    // negative weights fail loudly rather than corrupting every later prefix
    val bad = spark.range(5).select(col("id"), (col("id") - 2).as("w"))
    val e = intercept[Exception](
      Packing.cumulativeByRank(bad, Seq(col("id")), "w").count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null/negative weight")))
  }

  test("balancedShards: near-equal token mass per shard, deterministic across layouts") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n = 8
    val sharded = Packing.balancedShards(docs, "doc_id", "n_chars", n)
    val assign = sharded.select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(assign.values.toSet == (0L until n.toLong).toSet)
    // serpentine balance: each full round deals every shard one doc from
    // the heavy half and one from the light half — per-shard totals stay
    // within a few documents' worth of each other, where hash-dealing
    // lets token mass drift with the length distribution
    val totals = sharded.groupBy("shard").agg(sum(col("n_chars")).as("t"))
      .select("t").as[Long].collect()
    val maxW = docs.agg(max(col("n_chars"))).as[Long].head()
    assert(totals.max - totals.min <= 2 * maxW,
      s"shard totals spread ${totals.max - totals.min} exceeds 2×max doc (${2 * maxW})")
    assert(totals.min > 0)
    // identical assignment from a different input layout
    val re = Packing.balancedShards(docs.repartition(13), "doc_id", "n_chars", n)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(assign == re)
  }

  test("reserved output/scratch column names fail loudly instead of silently clobbering") {
    val df = Seq((1L, 5L)).toDF("id", "w")
    def msg(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(Packing.globalRank(df.withColumn("_rank", lit(0)), Seq(col("id"))))
      .contains("_rank"))
    assert(msg(Packing.epochOrder(df.withColumn("pos", lit(0)), "id", epoch = 1))
      .contains("pos"))
    assert(msg(Packing.balancedShards(df.withColumn("shard", lit(0)), "id", "w", 2))
      .contains("shard"))
    assert(msg(Packing.cumulativeByRank(df.withColumn("_cum", lit(0)), Seq(col("id")), "w"))
      .contains("_cum"))
    assert(msg(Packing.chunkTokens(Seq((1L, "a b")).toDF("chunk_idx", "text"),
      "chunk_idx", "text", 4)).contains("chunk_idx"))
    // and the guard does not fire on clean inputs
    assert(Packing.epochOrder(df, "id", epoch = 1).columns.contains("pos"))
  }

  test("groupRank equals the per-group row_number at any layout, without per-group windows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    import org.apache.spark.sql.expressions.Window
    val naive = docs.withColumn("rn",
        (row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))) - 1).cast("long"))
      .select("doc_id", "rn").as[(Long, Long)].collect().toMap
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    for (p <- Seq(1, 7, 32)) {
      val r = Packing.groupRank(docs.repartition(p), "source",
        Seq(col("n_chars"), col("doc_id")))
      val got = r.select("doc_id", "group_rank").as[(Long, Long)].collect().toMap
      assert(got == naive, s"group ranks drifted at $p partitions")
      val gn = r.select("source", "group_n").distinct().as[(String, Long)].collect().toMap
      assert(gn == sizes)
    }
  }

  test("groupRank spreads a dominant group across range partitions (no one-task funnel)") {
    // 95% of rows in ONE group — the shape that serializes a
    // partitioned window. groupRank's range shuffle keys on
    // (group, order) jointly, so the giant group must span many
    // partitions while ranks stay exact.
    val n = 20000
    val docs = spark.range(n).select(col("id"),
      when(col("id") % 20 =!= 0, lit("big")).otherwise(lit("small")).as("g"))
    val ranked = Packing.groupRank(docs.repartition(16), "g", Seq(col("id")))
    // correctness: within each group, ranks are the dense order of id
    val bigRanks = ranked.filter(col("g") === "big")
      .orderBy(col("id")).select("group_rank").as[Long].collect()
    assert(bigRanks.toSeq == bigRanks.indices.map(_.toLong))
    // scale mechanism: re-derive the physical layout groupRank uses
    // (the same repartitionByRange the operator issues) and assert the
    // dominant group does NOT collapse onto one task. AQE's
    // size-based partition COALESCING is disabled for the probe: at
    // 20k toy rows every partition is under the advisory size and AQE
    // legitimately merges them — at corpus scale partitions are
    // byte-bounded and no such merge applies, so coalescing here would
    // measure the toy size, not the range-spread mechanism.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    val spread =
      try {
        spark.conf.set(coalesceKey, "false")
        docs.repartitionByRange(col("g"), col("id"))
          .filter(col("g") === "big")
          .groupBy(spark_partition_id().as("p")).count()
          .as[(Int, Long)].collect()
      } finally spark.conf.set(coalesceKey, prev)
    // full spread = the session's shuffle-partition count (4 in the
    // test JVM) — a window partitioned by the group would put ALL of
    // the dominant group on exactly one
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(spread.length >= shufflePartitions - 1,
      s"dominant group landed on only ${spread.length} of $shufflePartitions partitions")
    val total = spread.map(_._2).sum
    assert(spread.map(_._2).max < total / 2,
      "one partition holds over half the dominant group")
  }

  test("groupRank keeps null-group rows as their own group (null-safe offset join)") {
    val df = Seq((1L, "a"), (2L, null), (3L, "a"), (4L, null), (5L, "b"))
      .toDF("id", "g")
    val r = Packing.groupRank(df, "g", Seq(col("id")))
    assert(r.count() == 5, "null-group rows must survive the offset join")
    val got = r.select("id", "group_rank", "group_n")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L), (3L, 1L, 2L),
      (2L, 0L, 2L), (4L, 1L, 2L), (5L, 0L, 1L)))
  }

  test("autoGroupRank dispatches on measured cardinality; both paths are value-identical") {
    val d = (0L until 120L).map(i => (i, s"g${i % 6}", (i * 37) % 101))
      .toDF("id", "grp", "v")
    // 6 distinct groups ≤ default cap → the broadcast-offset path runs
    val (lo, dLo) = Packing.autoGroupRank(d, "grp", Seq(col("v"), col("id")))
    assert(dLo.broadcastPath && dLo.nGroups == 6)
    // same data, cap forced below the cardinality → the window path runs
    val (hi, dHi) = Packing.autoGroupRank(d, "grp", Seq(col("v"), col("id")),
      maxBroadcastGroups = 5)
    assert(!dHi.broadcastPath && dHi.nGroups == 6)
    // the dispatch must be invisible in the VALUES: identical rows,
    // identical column names in identical order
    assert(lo.columns.toSeq == hi.columns.toSeq)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("id", "grp", "v", "group_rank", "group_n")
        .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(key(lo) == key(hi))
    // and both must equal the single-task window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val ref = d.withColumn("group_rank", row_number().over(w).cast("long") - 1)
      .withColumn("group_n", count(lit(1)).over(Window.partitionBy(col("grp"))))
    assert(key(lo) == key(ref))
  }
}
