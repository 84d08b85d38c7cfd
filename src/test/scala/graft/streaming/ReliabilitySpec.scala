package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Reliability layer semantics, mirroring the reference's DLQ/retry/
  * idempotency tests (reference: tests/test_enterprise_features.py:34-112,
  * tests/connectors/test_sink.py:20-40).
  */
class ReliabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("event_id", StringType),
    StructField("foo", StringType)))

  test("failing rows retry then land enriched in {topic}-dlq; good rows don't") {
    val root = Files.createTempDirectory("graft_dlq").toString
    val conn = new FileConnector(root, eventSchema)
    val batch = Seq(("e1", "ok"), ("e2", "boom"), ("e3", "ok")).toDF("event_id", "foo")

    Reliability.reliableBatch(conn, "orders", "event_id", maxRetries = 2) { row =>
      if (row.getString(1) == "boom") throw new RuntimeException("handler exploded")
    }.apply(batch, 0L)

    // the connector now knows the DLQ schema (base + metadata) itself
    val dlq = conn.readBatch(spark, conn.dlqTopic("orders")).collect()
    assert(dlq.length == 1)
    val r = dlq.head
    assert(r.getAs[String]("event_id") == "e2")
    assert(r.getAs[String]("_error").contains("handler exploded"))
    assert(r.getAs[String]("_original_stream") == "orders")
    assert(r.getAs[String]("_original_msg_id") == "e2")

    // replay: cleaned row returns to the main topic
    val n = Reliability.replayDlq(spark, conn, "orders")
    assert(n == 1)
    val replayed = conn.readBatch(spark, "orders").collect()
    assert(replayed.map(_.getAs[String]("event_id")).toSeq == Seq("e2"))
    // metadata really stripped ON DISK: schema INFERENCE over the topic
    // dir would surface any _-column a replay regression wrote (the
    // declared-schema read above silently drops undeclared columns, so
    // it cannot see them)
    val inferred = spark.read.option("recursiveFileLookup", "true")
      .json(s"$root/orders").schema.fieldNames
    assert(!inferred.exists(_.startsWith("_")), inferred.toSeq)
  }

  test("idempotent sink executes the side effect once per event_id across batches") {
    val tokenDir = Files.createTempDirectory("graft_tok").toString + "/tokens"
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    def sideEffect(df: org.apache.spark.sql.DataFrame): Unit =
      written.addAndGet(df.count())

    val b1 = Seq("e1", "e2", "e2").toDF("event_id") // in-batch dup
    val n1 = Reliability.idempotentWrite(spark, b1, "event_id", tokenDir)(sideEffect)
    assert(n1 == 2 && written.get() == 2)

    val b2 = Seq("e2", "e3").toDF("event_id") // cross-batch dup
    val n2 = Reliability.idempotentWrite(spark, b2, "event_id", tokenDir)(sideEffect)
    assert(n2 == 1 && written.get() == 3)
  }

  test("TTL'd token store: dedup within the window, tokens age out, state stays bounded") {
    val tokenDir = Files.createTempDirectory("graft_tok_ttl").toString + "/tokens"
    val clock = new java.util.concurrent.atomic.AtomicLong(1000L)
    val ttl = Some(10000L) // 10 s buckets
    val now = () => clock.get()
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    def eff(df: org.apache.spark.sql.DataFrame): Unit = written.addAndGet(df.count())

    val n1 = Reliability.idempotentWrite(spark, Seq("e1", "e2").toDF("event_id"),
      "event_id", tokenDir, ttl, now)(eff)
    assert(n1 == 2 && written.get() == 2)

    // same TTL window: e1 is suppressed
    val n2 = Reliability.idempotentWrite(spark, Seq("e1", "e3").toDF("event_id"),
      "event_id", tokenDir, ttl, now)(eff)
    assert(n2 == 1 && written.get() == 3)

    // jump past 2·ttl: e1's token has aged out → re-sent, not suppressed
    clock.set(1000L + 25000L)
    val n3 = Reliability.idempotentWrite(spark, Seq("e1", "e4").toDF("event_id"),
      "event_id", tokenDir, ttl, now)(eff)
    assert(n3 == 2 && written.get() == 5)

    // bounded state: the expired bucket was deleted on the way — only
    // live buckets (≤ 2 per the 2·ttl retention) remain as anti-join input
    val buckets = new java.io.File(tokenDir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(buckets.length == 1, s"expected only the live bucket, got ${buckets.toSeq}")
  }

  test("late split routes pre-watermark rows to the late leg; null ts goes late, not lost") {
    val batch = Seq(Some(5.0), Some(50.0), Some(100.0), None).toDF("sec")
      .select(timestamp_seconds(col("sec")).as("ts"))
    val (onTime, late) = Reliability.lateSplit(batch, "ts", new java.sql.Timestamp(50L * 1000))
    assert(onTime.count() == 2 && late.count() == 2) // 5.0 and the null-ts row
    assert(onTime.count() + late.count() == batch.count()) // nothing silently dropped
  }

  test("lateSideOutput lands the late leg in {topic}-late and returns on-time rows") {
    val root = Files.createTempDirectory("graft_late").toString
    val schema = StructType(Seq(StructField("event_id", StringType), StructField("sec", DoubleType)))
    val conn = new FileConnector(root, schema)
    val batch = Seq(("e1", 5.0), ("e2", 80.0)).toDF("event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val onTime = Reliability.lateSideOutput(conn, "tx", batch, "ts",
      new java.sql.Timestamp(50L * 1000), batchId = 0L)
    assert(onTime.select("event_id").as[String].collect().toSeq == Seq("e2"))
    val lateTopic = new FileConnector(root, batch.schema)
      .readBatch(spark, "tx-late").collect()
    assert(lateTopic.map(_.getAs[String]("event_id")).toSeq == Seq("e1"))
  }

  test("backoff schedule doubles and caps (reference pspf/processor.py:368-373)") {
    assert(Reliability.backoffMs(1) == 200)
    assert(Reliability.backoffMs(3) == 800)
    assert(Reliability.backoffMs(20) == 100 * 1024) // capped shift
  }
}
