package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The minimum end-to-end slice (SURVEY §7.3): per-user tumbling-window
  * sum through a real Structured Streaming query, asserting the
  * reference's canonical fixture (reference:
  * tests/test_stream_windowing.py:22-91 — user_1@[0,10)=15.0,
  * user_1@[10,20)=20.0, user_2@[0,10)=100.0).
  */
class StreamingSliceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming tumbling-window keyed sum matches the reference fixture") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Double)] // key, amount, epoch sec
    in.addData(("user_1", 10.0, 5.0), ("user_1", 5.0, 8.0),
      ("user_1", 20.0, 15.0), ("user_2", 100.0, 6.0))

    val events = in.toDF.toDF("key", "amount", "sec")
      .select(col("key"), col("amount"), timestamp_seconds(col("sec")).as("ts"))

    val agg = Pipeline(events)
      .watermarked("ts", "0 seconds")
      .windowAgg(TumblingWindow(10000), col("ts"), Seq(col("key")),
        Seq(sum(col("amount")).as("total")))
      .toDF
      .select(col("key"), col("window.start").cast("double").as("ws"), col("total"))

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("slice_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("slice_out")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == Set(
        ("user_1", 0.0, 15.0),
        ("user_1", 10.0, 20.0),
        ("user_2", 0.0, 100.0)))
    } finally q.stop()
  }

  test("keyed running fold state across triggers (reference e2e keyed sum foo=3, bar=5)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val folded = KeyedState.runningFold[String, (String, Long), Long](
      in.toDS(), _._1, 0L)((s, v) => s + v._2)
      .toDF("key", "total")

    val q = folded.writeStream.outputMode("update")
      .format("memory").queryName("fold_out").start()
    try {
      in.addData(("foo", 1L), ("bar", 5L))
      q.processAllAvailable()
      in.addData(("foo", 2L)) // second trigger folds onto checkpointed state
      q.processAllAvailable()
      val got = spark.table("fold_out").groupBy("key").agg(max("total").as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("foo" -> 3L, "bar" -> 5L))
    } finally q.stop()
  }

  test("left-outer windowed stream-stream join emits unmatched left rows after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(String, Double)]
    val r = MemoryStream[(String, Double)]
    val lDf = l.toDF.toDF("lkey", "lsec")
      .select(col("lkey"), timestamp_seconds(col("lsec")).as("lts"))
    val rDf = r.toDF.toDF("rkey", "rsec")
      .select(col("rkey"), timestamp_seconds(col("rsec")).as("rts"))
    val joined = StreamJoins.windowedStreaming(
      lDf, rDf, "lkey", "rkey", "lts", "rts",
      withinMs = 5000, watermarkDelay = "0 seconds", joinType = "left_outer")
    val q = joined.select(col("lkey"), col("rts").cast("double"))
      .writeStream.outputMode("append").format("memory").queryName("loj_out").start()
    try {
      l.addData(("a", 10.0), ("b", 10.0))
      r.addData(("a", 12.0))
      q.processAllAvailable()
      // advance both watermarks far past the join horizon so the
      // unmatched 'b' row is finalized and emitted with a null right side
      l.addData(("z", 1000.0)); r.addData(("z", 1000.0))
      q.processAllAvailable()
      val got = spark.table("loj_out")
        .collect().map(row => (row.getString(0), Option(row.get(1)))).toSet
      assert(got.contains(("a", Some(12.0))) && got.contains(("b", None)))
    } finally q.stop()
  }

  test("streaming dedup by event_id drops in-batch and cross-batch duplicates (W12)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)] // event_id, sec
    val deduped = in.toDF.toDF("event_id", "sec")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData(("e1", 1.0), ("e1", 2.0), ("e2", 3.0))
      q.processAllAvailable()
      in.addData(("e2", 4.0), ("e3", 5.0)) // e2 is a cross-batch duplicate
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id").as[String].collect().sorted
      assert(got.toSeq == Seq("e1", "e2", "e3"))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by the watermark horizon (W12 at scale)") {
    // plain dropDuplicates keeps every id forever; the WithinWatermark
    // form evicts an id once the watermark passes its horizon — the
    // only shape a 100 TB/day stream can run. Eviction is observable:
    // a duplicate arriving after expiry re-emits.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val deduped = in.toDF.toDF("event_id", "sec")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "5 seconds")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      in.addData(("e1", 10.0), ("e1", 11.0), ("e2", 12.0)) // in-batch dup
      q.processAllAvailable()
      in.addData(("e1", 13.0)) // cross-batch dup, inside the horizon
      q.processAllAvailable()
      in.addData(("adv", 100.0)) // watermark → 95, evicts e1/e2 state
      q.processAllAvailable()
      in.addData(("e1", 101.0)) // same id, AFTER eviction → re-emits
      q.processAllAvailable()
      val counts = spark.table("dedup_wm_out").groupBy("event_id").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(counts == Map("e1" -> 2L, "e2" -> 1L, "adv" -> 1L),
        s"horizon dedup mismatch: $counts")
    } finally q.stop()
  }

  test("foldAggregator: the fold callback as a first-class aggregate in Dataset agg and SQL") {
    import org.apache.spark.sql.functions._
    // (count, sum) stats fold with an associative merge → map-side
    // partial aggregation, unlike the sequential mapGroupsWithState form
    val stats = KeyedState.foldAggregator((0L, 0.0))(
      (s: (Long, Double), v: Double) => (s._1 + 1, s._2 + v))(
      (a, b) => (a._1 + b._1, a._2 + b._2))
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").cast("long").as("k"), col("value").cast("double").as("v"))

    // typed Dataset aggregation path
    val typed = events.as[(Long, Double)].groupByKey(_._1).mapValues(_._2)
      .agg(stats.toColumn.name("st"))
      .collect().map { case (k, (n: Long, s: Double)) => (k, n, math.round(s * 100)) }.toSet
    // SQL path via udaf registration (the §2.6 registration surface)
    spark.udf.register("fold_stats", udaf(stats))
    events.createOrReplaceTempView("fold_events")
    val viaSql = spark.sql(
        "SELECT k, fold_stats(v) AS st FROM fold_events GROUP BY k")
      .collect().map { r =>
        val st = r.getStruct(1); (r.getLong(0), st.getLong(0), math.round(st.getDouble(1) * 100))
      }.toSet
    // ground truth from built-ins
    val builtin = events.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(typed == builtin && viaSql == builtin && builtin.nonEmpty)
  }

  test("windowed arbitrary fold: reference fixture via mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Double)] // key, amount, sec
    // a fold windowAgg can NOT express as one aggregate: tuple state
    // tracking (max-so-far, min-so-far), emitted as the spread — the
    // arbitrary-user-fold capability windowedFold exists for
    val folded = KeyedState.windowedFold[String, (String, Double, Double), (Double, Double)](
      in.toDS(), _._1, _._3, windowSizeSec = 10L,
      zero = (Double.MinValue, Double.MaxValue))(
      (s, v) => (math.max(s._1, v._2), math.min(s._2, v._2)))
      .map { case ((k, ws), (mx, mn)) => (k, ws, mx - mn) }
      .toDF("key", "ws", "spread")
    val q = folded.writeStream.outputMode("update")
      .format("memory").queryName("wfold_out").start()
    try {
      in.addData(("user_1", 10.0, 5.0), ("user_1", 5.0, 8.0),
        ("user_1", 20.0, 15.0), ("user_2", 100.0, 6.0))
      q.processAllAvailable()
      val got = spark.table("wfold_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // user_1 [0,10): amounts {10,5} → spread 5; [10,20): {20} → 0
      assert(got == Set(("user_1", 0L, 5.0), ("user_1", 10L, 0.0), ("user_2", 0L, 0.0)))
    } finally q.stop()
  }

  test("windowed stream-stream join pairs within the time bound (reference Joiner)") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(String, Double)]
    val r = MemoryStream[(String, Double)]
    val lDf = l.toDF.toDF("lkey", "lsec")
      .select(col("lkey"), timestamp_seconds(col("lsec")).as("lts"))
    val rDf = r.toDF.toDF("rkey", "rsec")
      .select(col("rkey"), timestamp_seconds(col("rsec")).as("rts"))

    val joined = StreamJoins.windowedStreaming(
      lDf, rDf, "lkey", "rkey", "lts", "rts",
      withinMs = 5000, watermarkDelay = "0 seconds")

    val q = joined.select(col("lkey"), col("lts").cast("double"), col("rts").cast("double"))
      .writeStream.outputMode("append").format("memory").queryName("join_out").start()
    try {
      l.addData(("a", 10.0), ("a", 100.0), ("b", 10.0))
      r.addData(("a", 12.0), ("b", 50.0))
      q.processAllAvailable()
      val got = spark.table("join_out")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      // a@10 joins a@12 (within 5s); a@100 vs 12 and b@10 vs b@50 are out of range
      assert(got == Set(("a", 10.0, 12.0)))
    } finally q.stop()
  }
}
