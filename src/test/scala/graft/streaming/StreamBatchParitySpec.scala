package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One engine, two modes: the SAME declarative aggregation produces the
  * same result over the events table whether executed as a batch query
  * (what the oracle grades) or as a Structured Streaming query (what
  * production runs). This is the core Spark-first claim of the engine.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tumbling window agg: streaming result == batch result on sf0.001 events") {
    val dir = "/root/testdata/sf0.001"
    def aggregate(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("window.start").cast("long").as("ws"), col("event_type"),
          col("n"), round(col("v"), 4).as("v"))

    val batch = aggregate(Tables.load(spark, dir, "events"))
      .collect().map(_.toSeq).toSet

    // the RAW parquet read below bypasses Tables.load, so it needs the
    // ns-timestamp conf itself (Tables.load set it above, but this read
    // must not depend on that call order); normalizeTs absorbs whichever
    // physical ts encoding the generator wrote
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file streaming source needs a directory; glob-filter to the table
    val stream = Tables.normalizeTs(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    val q = aggregate(stream)
      .writeStream.outputMode("complete").format("memory").queryName("parity_out").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("parity_out").collect().map(_.toSeq).toSet
      assert(streaming == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("as-of join: streaming state result == batch window formulation on sf0.001 events") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        col("event_id").cast("long").as("event_id"))
      .collect()
    val clicks = e.filter(_.getString(2) == "click")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val purchases = e.filter(_.getString(2) == "purchase")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))

    // batch ground truth: j3's union-tag window formulation at micros
    def df(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "ts_us", "event_id")
    val expected = StreamJoins.asofStreaming(
        df(clicks.toSeq), df(purchases.toSeq), "user_id", "ts_us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    // cross-check the batch run itself against an independent in-memory
    // reference (per-key sorted fold) before using it as ground truth
    val ref = {
      val byUser = (clicks.map(c => (c._1, c._2, 1, c._3)) ++
        purchases.map(p => (p._1, p._2, 0, p._3))).groupBy(_._1)
      byUser.values.flatMap { rows =>
        var latest = Option.empty[Long]
        rows.sortBy(x => (x._2, x._3)).flatMap {
          case (_, t, 0, _) => latest = Some(latest.fold(t)(math.max(t, _))); None
          case (_, t, _, id) => Some((id, t, latest))
        }
      }.toSet
    }
    assert(expected == ref && expected.nonEmpty)

    // streaming: feed both sides in three CHRONOLOGICAL chunks (arrival
    // order = event order, the contract the operator documents)
    val cuts = {
      val all = (clicks ++ purchases).map(_._2).sorted
      Seq(all((all.length * 1) / 3), all((all.length * 2) / 3))
    }
    implicit val sqlCtx = spark.sqlContext
    val lIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val rIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val out = StreamJoins.asofStreaming(
      lIn.toDF().toDF("user_id", "ts_us", "event_id"),
      rIn.toDF().toDF("user_id", "ts_us", "event_id"),
      "user_id", "ts_us", "event_id")
    // one AvailableNow pass per chunk over a SHARED checkpoint: both
    // sides' chunk data are fully added before the query starts, so a
    // trigger can never catch clicks without their same-chunk purchases
    // (a continuously-running query could fire between the two addData
    // calls and emit premature Nones — observed flake), and each
    // restart proves the per-key state survives via the checkpoint
    val ckpt = java.nio.file.Files.createTempDirectory("asof_ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Option[Long])]()
    def chunk(lo: Option[Long], hi: Option[Long]): Unit = {
      def in(t: Long) = lo.forall(t >= _) && hi.forall(t < _)
      lIn.addData(clicks.filter(c => in(c._2)).toSeq)
      rIn.addData(purchases.filter(p => in(p._2)).toSeq)
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => got.add((r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))))
        }
        .start()
      q.awaitTermination()
    }
    chunk(None, Some(cuts(0)))
    chunk(Some(cuts(0)), Some(cuts(1)))
    chunk(Some(cuts(1)), None)
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == expected)
  }
}
