package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Ops surface (reference pspfctl: dlq-inspect/purge, inspect). */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", StringType), StructField("v", LongType)))

  test("dlq inspect/count/purge lifecycle") {
    val root = Files.createTempDirectory("graft_ops").toString
    val conn = new FileConnector(root, schema)
    val batch = Seq(("e1", 1L), ("e2", 2L)).toDF("event_id", "v")
    Reliability.reliableBatch(conn, "t", "event_id", maxRetries = 0) { _ =>
      throw new RuntimeException("always fails")
    }.apply(batch, 0L)

    assert(Ops.dlqCount(spark, conn, "t") == 2)
    assert(Ops.dlqInspect(spark, conn, "t", limit = 1).count() == 1)
    assert(Ops.inspect(spark, conn, "t-dlq", "event_id", 10)
      .select("event_id").as[String].collect().toSeq == Seq("e1", "e2"))

    assert(Ops.dlqPurge(spark, conn, "t"))
    assert(!new java.io.File(s"$root/t-dlq").exists())
    assert(Ops.dlqPurge(spark, conn, "t")) // idempotent on missing
  }

  test("health reports active queries and empties when they stop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    assert(Ops.health(spark).filter($"name" === "graft_health_probe").isEmpty)
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Int]
    ms.addData(1, 2, 3)
    val q = ms.toDF().writeStream.queryName("graft_health_probe")
      .format("memory")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_health").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      val row = Ops.health(spark).filter($"name" === "graft_health_probe").collect()
      assert(row.length == 1 && row.head.getAs[Boolean]("active"))
      assert(row.head.getAs[Long]("last_input_rows") >= 0L)
    } finally q.stop()
    assert(Ops.health(spark).filter($"name" === "graft_health_probe").isEmpty)
  }

  test("interactive state query reads keyed aggregation state from a checkpoint") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_state").toString
    val conn = new FileConnector(root, schema)
    Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("event_id", "v")
      .write.mode("append").json(s"$root/in")
    val q = conn.readStream(spark, "in")
      .groupBy(col("event_id"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // the reference exposes this over a cluster HTTP API
    // (cluster_api.py:29-82); here it's a plain scan of the state store
    // value struct holds the aggregation BUFFER (field names are the
    // buffer's, e.g. `sum`/`count`, not the query's output aliases)
    val state = Ops.stateQueryFlat(spark, s"$root/ckpt").collect()
    val byKey = state.map(r => r.getAs[String]("event_id") -> r).toMap
    assert(byKey.keySet == Set("a", "b"))
    assert(byKey("a").getAs[Long]("sum") == 3L && byKey("a").getAs[Long]("count") == 2L)
    assert(byKey("b").getAs[Long]("sum") == 5L && byKey("b").getAs[Long]("count") == 1L)
  }

  test("Ctl dispatches the pspfctl verbs over a file-backed topic") {
    val root = Files.createTempDirectory("graft_ctl").toString
    val conn = new FileConnector(root, schema)
    val batch = Seq(("e1", 1L), ("e2", 2L)).toDF("event_id", "v")
    conn.writeBatch(batch.filter($"event_id" === "e1"), "t2") // main topic exists for schema inference
    Reliability.reliableBatch(conn, "t2", "event_id", maxRetries = 0) { _ =>
      throw new RuntimeException("always fails")
    }.apply(batch, 0L)

    assert(graft.Ctl.run(spark, root, "dlq-count", Array("t2")) == Right("2"))
    val ins = graft.Ctl.run(spark, root, "dlq-inspect", Array("t2", "1"))
    assert(ins.isRight && ins.toOption.get.contains("_error"))
    assert(graft.Ctl.run(spark, root, "replay", Array("t2")) == Right("replayed=2"))
    val main = conn.readBatch(spark, "t2").select("event_id")
    assert(main.as[String].collect().sorted.toSeq == Seq("e1", "e1", "e2"))
    assert(graft.Ctl.run(spark, root, "bogus", Array.empty).isLeft)
  }

  test("Ctl drives the index/band-store lifecycle verbs") {
    val root = Files.createTempDirectory("graft_ctl_ix").toString
    // a tiny persisted ANN index with two appended drops
    val emb = (0L until 8L).map(i =>
      (i, Array.tabulate(8)(d => (if (i % 2 == 0) 1.0f else -1.0f) * (1.0f + 0.01f * (i + d)))))
      .toDF("vec_id", "embedding")
    graft.operators.AnnIndex.buildIvfPq(emb.filter($"vec_id" < 4),
      "vec_id", "embedding", dim = 8, m = 2, k = 2, nCentroids = 2, dir = s"$root/ix")
    Seq(0L, 1L).foreach { b =>
      graft.operators.AnnIndex.appendVectors(spark, s"$root/ix",
        emb.filter($"vec_id" >= 4 + 2 * b && $"vec_id" < 6 + 2 * b),
        "vec_id", "embedding", dim = 8, m = 2, ingestTag = s"batch_$b")
    }
    assert(graft.Ctl.run(spark, root, "index-ingests", Array("ix")) ==
      Right("base\nbatch_0\nbatch_1"))
    assert(graft.Ctl.run(spark, root, "index-compact", Array("ix", "2")) ==
      Right("folded=2"))
    assert(graft.Ctl.run(spark, root, "index-ingests", Array("ix")) ==
      Right("base\nbatch_1"))
    assert(graft.Ctl.run(spark, root, "index-compact", Array("ix", "nope")).isLeft)
    // a typo'd index path is an ERROR, not an empty-but-healthy report
    assert(graft.Ctl.run(spark, root, "index-ingests", Array("no_such_ix")).isLeft)

    // closed-loop compaction verb: after the fold above, one eligible
    // batch stands — below ceiling 2, the cron-safe verb holds
    assert(graft.Ctl.run(spark, root, "index-autocompact", Array("ix", "2", "2")) ==
      Right("standing=1 ceiling=2 compacted=false folded=0"))
    assert(graft.Ctl.run(spark, root, "index-autocompact", Array("ix", "0", "2")).isLeft)

    // lease ops verbs: inspect the holder, refuse to break live
    // without --force, forced break clears it
    assert(graft.Ctl.run(spark, root, "lease-status", Array("ix")) ==
      Right("unleased"))
    graft.operators.StoreLease.acquire(spark, s"$root/ix", "cron-vacuum")
    // generation counts the store's whole maintenance history (the
    // leased verbs above each consumed one), so pin the owner and
    // liveness, not the running count
    val st = graft.Ctl.run(spark, root, "lease-status", Array("ix")).toOption.get
    assert(st.startsWith("owner=cron-vacuum generation=") &&
      st.endsWith("expired=false"))
    assert(graft.Ctl.run(spark, root, "lease-break", Array("ix")).isLeft)
    assert(graft.Ctl.run(spark, root, "lease-break", Array("ix", "--force"))
      .toOption.get.contains("LIVE"))
    assert(graft.Ctl.run(spark, root, "lease-status", Array("ix")) ==
      Right("unleased"))

    // right-to-erasure verbs: tombstone two ids, inspect the standing
    // deletion state, and confirm serving masks them
    assert(graft.Ctl.run(spark, root, "index-tombstones", Array("ix")) ==
      Right("dead_ids=0"))
    // duplicate tokens ("4" twice, once zero-padded) count ONCE: the
    // verb reports distinct tombstoned ids after the cast to the
    // index's id type, not raw input tokens
    assert(graft.Ctl.run(spark, root, "index-delete",
      Array("ix", "vec_id", "2,4,04,4", "erasure_1")) ==
      Right("tombstoned=2 distinct ids under ingest=erasure_1"))
    assert(graft.Ctl.run(spark, root, "index-tombstones", Array("ix")) ==
      Right("dead_ids=2"))
    val servedIds = graft.operators.AnnIndex.serveIvfPq(
        graft.operators.AnnIndex.load(spark, s"$root/ix"),
        emb.filter($"vec_id" === 0), "vec_id", "embedding",
        dim = 8, m = 2, nProbe = 2, topK = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(!servedIds(2L) && !servedIds(4L))
    assert(graft.Ctl.run(spark, root, "index-delete",
      Array("ix", "vec_id", "2,x", "erasure_2")).isLeft)

    // band store: two drops through the streaming loop, folded via ctl
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "completely unrelated words about some other topic entirely here"))
      .toDF("doc_id", "text")
    docs.write.mode("append").parquet(s"$root/src")
    val cfg = graft.streaming.IncrementalDedup.Config("doc_id", "text", 3, 8, 2)
    graft.streaming.IncrementalDedup.run(
      spark.readStream.schema(docs.schema).parquet(s"$root/src"),
      cfg, s"$root/bands", s"$root/out", s"$root/ckpt").awaitTermination()
    Seq((3L, "the quick brown fox jumps over the lazy dog every day"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$root/src")
    graft.streaming.IncrementalDedup.run(
      spark.readStream.schema(docs.schema).parquet(s"$root/src"),
      cfg, s"$root/bands", s"$root/out", s"$root/ckpt").awaitTermination()
    // closed-loop verb first: 2 standing <= ceiling 2 → hold, untouched
    assert(graft.Ctl.run(spark, root, "bands-autocompact", Array("bands", "2", "2")) ==
      Right("standing=2 ceiling=2 compacted=false folded=0"))
    // past the ceiling it folds — the same fold the manual verb runs
    assert(graft.Ctl.run(spark, root, "bands-autocompact", Array("bands", "1", "2")) ==
      Right("standing=2 ceiling=1 compacted=true folded=2"))
    assert(graft.Ctl.run(spark, root, "bands-autocompact", Array("bands", "0", "2")).isLeft)
    // nothing left for the manual verb after the loop's fold
    assert(graft.Ctl.run(spark, root, "bands-compact", Array("bands", "2")) ==
      Right("folded=0"))
  }

  test("Ctl sidecar-refresh verbs heal a drifted store without rewriting data") {
    import graft.operators.Layout
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_ctl_sidecar").toString
    val d = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    Layout.writeClustered(d, s"$root/store", Seq("k"), numPartitions = 4)
    Layout.writeBloomSidecar(spark, s"$root/store", "k")
    // out-of-band append → both pruned readers fail loudly
    spark.range(9000, 9100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("append").parquet(s"$root/store")
    assert(intercept[IllegalArgumentException](
      Layout.prunedRead(spark, s"$root/store", Seq(Layout.ColRange("k", 0, 10))))
      .getMessage.contains("stats-refresh"))
    // the verbs the error message names execute the recovery
    assert(graft.Ctl.run(spark, root, "stats-refresh", Array("store", "k")) ==
      Right("refreshed _filestats over k"))
    assert(graft.Ctl.run(spark, root, "bloom-refresh", Array("store", "k")) ==
      Right("refreshed _filebloom over k"))
    // healed: pruned reads see the appended rows through the residual
    val scan = Layout.prunedRead(spark, s"$root/store",
      Seq(Layout.ColRange("k", 9000, 9099)))
    assert(scan.df.filter(col("k").between(9000, 9099)).count() == 100)
    val bloom = Layout.bloomPrunedRead(spark, s"$root/store", Seq(9050L))
    assert(bloom.df.filter(col("k") === 9050L).count() == 1)
    // bad args take the usage path
    assert(graft.Ctl.run(spark, root, "stats-refresh", Array("store", " , ")).isLeft)
  }

  test("Ctl decon-leaks triages the decontamination guard's side output per drop") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ctl_decon").toString
    // two committed leak partitions (the runDecontaminate leakDir
    // shape) + one torn partition that must stay invisible
    Seq((7L, 20L, 5L, true)).toDF("doc_id", "n_fp", "n_overlap", "contaminated")
      .write.parquet(s"$root/leak/ingest_batch=0")
    Seq((32L, 18L, 4L, true), (57L, 25L, 6L, true))
      .toDF("doc_id", "n_fp", "n_overlap", "contaminated")
      .write.parquet(s"$root/leak/ingest_batch=1")
    Seq((99L, 1L, 1L, true)).toDF("doc_id", "n_fp", "n_overlap", "contaminated")
      .write.parquet(s"$root/leak/ingest_batch=2")
    new java.io.File(s"$root/leak/ingest_batch=2/_SUCCESS").delete()
    val out = graft.Ctl.run(spark, root, "decon-leaks", Array("leak", "2"))
    assert(out.isRight, out.toString)
    val text = out.toOption.get
    assert(text.contains("n_leaked"))
    assert(!text.contains("99"), s"torn partition leaked into the report: $text")
    // newest first, bounded: docs 32 and 57 (drop 1), not drop 0's 7
    val newest = text.split("newest routed docs").last
    assert(newest.contains("32") && newest.contains("57") && !newest.contains(" 7 "),
      s"expected drop 1's docs first: $newest")
    // a missing dir takes the usage path, not a stack trace
    assert(graft.Ctl.run(spark, root, "decon-leaks", Array("no_such_dir")).isLeft)
  }

  test("Ctl topkeys reports hot-key share for the salting decision") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ctl_topkeys").toString
    // 60% of rows on one hot key, the rest spread across 40 keys
    spark.range(1000).select(
        when(col("id") < 600, lit("hot")).otherwise(concat(lit("k"), col("id") % 40)).as("user"),
        col("id"))
      .write.parquet(s"$root/events")
    val out = graft.Ctl.run(spark, root, "topkeys", Array("events", "user", "3"))
    assert(out.isRight, out.toString)
    val lines = out.toOption.get.split("\n")
    assert(lines.head.contains("user") && lines.head.contains("pct"))
    assert(lines.length == 4) // header + k rows
    assert(lines(1).contains("hot") && lines(1).contains("600") && lines(1).contains("60.0"))
    // bad column takes the usage path, not a stack trace
    assert(graft.Ctl.run(spark, root, "topkeys", Array("events", "no_such_col")).isLeft)
  }

  test("Ctl hotvalues answers the threshold question through the MG sketch path") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_ctl_hotv").toString
    // 600 hot + 300 warm + scattered cold: minFreq 200 keeps exactly two
    spark.range(1000).select(
        when(col("id") < 600, lit("hot"))
          .when(col("id") < 900, lit("warm"))
          .otherwise(concat(lit("k"), col("id") % 40)).as("user"))
      .write.parquet(s"$root/events")
    val out = graft.Ctl.run(spark, root, "hotvalues", Array("events", "user", "200"))
    assert(out.isRight, out.toString)
    val text = out.toOption.get
    assert(text.startsWith("path: sketched"), text.linesIterator.next())
    val lines = text.split("\n")
    assert(lines.length == 4, text) // path line + header + 2 rows
    assert(lines(2).contains("hot") && lines(2).contains("600"))
    assert(lines(3).contains("warm") && lines(3).contains("300"))
    // malformed threshold and bad column both take the usage path
    assert(graft.Ctl.run(spark, root, "hotvalues", Array("events", "user", "zero")).isLeft)
    assert(graft.Ctl.run(spark, root, "hotvalues", Array("events", "no_col", "5")).isLeft)
  }
}
