package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the `noop` sink — count() would let
  * Catalyst elide sorts/projections and under-report; noop executes the
  * full plan including output columns, without sink I/O cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm each query's codegen/JIT at the smallest SF before timing —
    // cold-start compile cost (~4-6 s per complex plan) is driver-JVM
    // overhead, not engine throughput; steady state is what scales to a
    // long-lived cluster. Falls back to the target dir's region table if
    // no sf0.001 sibling exists.
    val warm = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    // SPARK_GRAFT_ONLY=q1_agg,stream_graftlog — subset for local
    // iteration (streaming probes selectable by name); unset or blank
    // (the driver's mode) runs the full suite + probes
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // single source of truth for probe names — the validation below and
    // the run loop share this Seq, so adding a probe can't drift them
    val probes: Seq[(String, () => Double)] = Seq(
      "stream_window_agg" -> (() => streamingWindowAgg(spark, sfDir)),
      "stream_graftlog" -> (() => streamingGraftLog(spark)),
      "stream_ann_serve" -> (() => streamingAnnServe(spark, sfDir)))
    only.foreach { sel =>
      val unknown = sel.diff(SparkEntry.queries.keySet ++ probes.map(_._1))
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    if (warm.isDirectory)
      queries.foreach { case (name, fn) =>
        try fn(spark, warm.toString).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
      }
    else spark.read.parquet(s"$sfDir/region.parquet").count()

    // Streaming-startup decomposition: the checkpointed multi-drop
    // loops (l61/l66/l92-l95/l93) spend most of their sf0.1 wall time
    // on fixed per-streaming-query STARTUP (plan/checkpoint/source
    // init before the first batch commits), which scales with the
    // DROP COUNT, not the data — at a real crawl's drop cadence it
    // amortizes to noise. Record it per bench entry so single-run
    // driver captures can be adjudicated against a measured startup
    // share instead of prose: for every streaming query started
    // inside a timed window, time from start() to its FIRST progress
    // event (= first batch commit), summed over the window's queries.
    val qStartedAt = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    val qFirstCommit = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        qStartedAt.put(e.runId, System.nanoTime()): Unit
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        Option(qStartedAt.get(e.progress.runId)).foreach { t0 =>
          qFirstCommit.putIfAbsent(e.progress.runId, System.nanoTime() - t0): Unit
        }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    // The listener bus is asynchronous: events for a query that just
    // terminated can still be in flight when the timed call returns.
    // Poll OUTSIDE the timed window until every started query has its
    // first-commit record (bounded — a zero-batch query never commits).
    def drainStartup(): Double = {
      val deadline = System.nanoTime() + 500L * 1000 * 1000
      while (qFirstCommit.size < qStartedAt.size && System.nanoTime() < deadline)
        Thread.sleep(10)
      // an expired deadline with queries still uncommitted means the
      // reported startup_s UNDERCOUNTS (a late progress event, or a
      // zero-batch query that never commits) — make that visible
      // instead of silently publishing a low number
      if (qFirstCommit.size < qStartedAt.size)
        System.err.println(s"[bench] startup_s undercount: " +
          s"${qStartedAt.size - qFirstCommit.size} of ${qStartedAt.size} " +
          "started streaming queries never recorded a first commit " +
          "before the drain deadline")
      import scala.jdk.CollectionConverters._
      qFirstCommit.values.asScala.map(_.toDouble / 1e9).sum
    }

    // min of 3 timed runs per query: shields the reported number from
    // transient host contention (observed 2-10x spikes on shared
    // hardware — min-of-2 still let several untouched queries report
    // 3-8x swings round-to-round) while measuring full honest
    // executions. A query that THROWS reports the -1 sentinel and lands
    // in "failed" — its (near-zero) elapsed time must not fold into the
    // totals as if it were a fast success.
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      qStartedAt.clear(); qFirstCommit.clear()
      val t0 = System.nanoTime()
      val elapsed = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally {
        // queries that persist intermediates (l12) must not hand their
        // cache to the NEXT timed run — every measurement pays the full
        // compute, or min-of-N would report a cached partial execution
        spark.catalog.clearCache()
        // clearCache only covers CacheManager frames; operators that
        // materialize raw RDDs (connectedComponents' rounds) leave
        // persisted blocks behind that would pressure every later
        // measurement — release those too
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      // outside the timed window: wait for the async listener events,
      // then charge this run its summed streaming-startup seconds — a
      // FAILED run reports no startup (its -1 never merges into the
      // startup_s column) and must not pay the 500 ms drain for nothing
      (elapsed, if (elapsed < 0 || qStartedAt.isEmpty) 0.0 else drainStartup())
    }
    val timed = queries.map { case (name, fn) =>
      // a transiently-failing run must not discard an honest other
      // measurement: failed only when ALL runs threw
      name -> (1 to 3).map(_ => timeOnce(name, fn)).filter(_._1 >= 0)
    }
    def probeOnce(f: () => Double): (Double, Double) = {
      qStartedAt.clear(); qFirstCommit.clear()
      val t = f()
      (t, if (t < 0 || qStartedAt.isEmpty) 0.0 else drainStartup())
    }
    val probed = probes.collect {
      case (n, f) if only.forall(_.contains(n)) => n -> probeOnce(f) }
    val results = timed.map { case (name, runs) =>
      name -> (if (runs.isEmpty) -1.0 else runs.map(_._1).min)
    } ++ probed.map { case (n, (t, _)) => n -> t }
    // startup_s column: the startup seconds of the run whose time is
    // reported (the min run), for every entry that started at least
    // one streaming query — batch-only queries carry no row
    val startup = timed.collect {
      case (n, runs) if runs.nonEmpty && runs.minBy(_._1)._2 > 0.0 =>
        n -> runs.minBy(_._1)._2
    } ++ probed.collect { case (n, (t, s)) if t >= 0 && s > 0.0 => n -> s }
    // In-process variance column: max/min over the query's own timed
    // runs, reported when >= 2x. The min-of-3 headline shields the
    // TOTALS from host flaps, but a single-run driver capture can
    // still show a maintenance query at many times its committed
    // median (l78 hit 13x once) — this column makes that worst case a
    // recorded measurement the round adjudication can quote, instead
    // of hand-analysis across artifacts.
    val spread = timed.collect {
      case (n, runs) if runs.size >= 2 && runs.map(_._1).min > 0 &&
        runs.map(_._1).max / runs.map(_._1).min >= 2.0 =>
        n -> runs.map(_._1).max / runs.map(_._1).min
    }
    val spreadJson = spread.map { case (k, v) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    val startupJson = startup.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir","spread":$spreadJson,"startup_s":$startupJson}"""
    println(line)
    // The stdout line is the driver's contract, but a tail-capture of a
    // long run can truncate it (BENCH_r05 lost 23 queries' timings that
    // way). Persist the same JSON to a file so every per-query number is
    // verifiable from a durable artifact regardless of console capture.
    val out = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Structured Streaming throughput probe: the full events table driven
    * through a real streaming query (file source → watermark → tumbling
    * keyed agg → noop sink, AvailableNow) — the engine's flagship
    * streaming path under timing. */
  private def streamingWindowAgg(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val t0 = System.nanoTime()
    try {
      val ckpt = graft.Scratch.dir("graft_bench_ckpt")
      // file streaming source needs a directory; glob down to the table
      // normalizeTs: absorbs either physical ts encoding (int64-nanos
      // or µs-NTZ) the generator wrote
      val q = Tables.normalizeTs(spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream_window_agg: ${e.getMessage}")
        -1.0
    }
  }

  /** Streaming ANN-serving probe: the persisted IVF-PQ index used as a
    * STREAM enrichment — every arriving embedding batch is served its
    * top-k neighbors from the index via foreachBatch (the crawl-ingest
    * "is this near anything we already hold?" shape l61 runs for
    * MinHash bands, here on the vector side). The index build is the
    * store's standing cost and stays OUTSIDE the timed window; the
    * measurement is the streaming serve itself: per-batch broadcast of
    * nProbe bucket ids + ADC over candidate lists, never a scan of the
    * full index. */
  private def streamingAnnServe(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions._
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val ixDir = graft.Scratch.dir("graft_bench_annix")
      graft.operators.AnnIndex.buildIvfPq(emb, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, nCentroids = 16, dir = ixDir)
      val ix = graft.operators.AnnIndex.load(spark, ixDir)
      val schema = emb.schema
      val ckpt = graft.Scratch.dir("graft_bench_ann_ckpt")
      val served = new java.util.concurrent.atomic.AtomicLong(0L)
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet").parquet(sfDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          served.addAndGet(graft.operators.AnnIndex.serveIvfPqBatch(
            ix, batch, "vec_id", "embedding",
            dim = 64, m = 4, nProbe = 4, topK = 10).count())
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(served.get() > 0, "ANN streaming probe served no neighbors")
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream_ann_serve: ${e.getMessage}")
        -1.0
    }
  }

  /** Broker-read throughput probe: 50k records pre-produced into a
    * graftlog topic (8 partitions), then one timed streaming drain
    * (DSv2 micro-batch source → keyed agg → noop). Produce time is NOT
    * in the measurement — it is the client's cost, as with any broker. */
  private def streamingGraftLog(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    try {
      val root = graft.Scratch.dir("graft_bench_log")
      val dir = s"$root/topic"
      var i = 0
      while (i < 50000) {
        graft.sources.GraftLog.append(dir, 8, s"k${i % 97}", s"""{"n":$i}""")
        i += 1
      }
      val ckpt = s"$root/ckpt"
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graftlog").load(dir)
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream_graftlog: ${e.getMessage}")
        -1.0
    }
  }
}
