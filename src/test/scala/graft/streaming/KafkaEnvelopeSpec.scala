package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KafkaConnector's envelope mapping, testable without a broker or the
  * kafka jar: wrap/unwrap are pure DataFrame transforms (reference:
  * KafkaStreamBackend produce/consume payload handling,
  * pspf/connectors/kafka.py:105-147 — JSON value with in-payload
  * event_type, pspf/stream.py:235-247).
  */
class KafkaEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("golden wire-format fixtures: wrap emits byte-exact Kafka record values") {
    // The contract a real broker swap depends on: these UTF-8 byte
    // sequences are what lands in the Kafka record `value`. Pinned
    // byte-for-byte so any change to column ordering, number rendering,
    // escaping, or null handling fails here instead of on a live topic.
    // Conventions pinned: field order = column order; doubles render
    // with a trailing .0; longs bare; quotes/backslash/newline escaped
    // as \" \\ \n; non-ASCII stays raw UTF-8 (no \u escapes); null
    // columns are DROPPED from the payload (Spark ignoreNullFields).
    val conn = new KafkaConnector("unused:9092")
    val rows = Seq(
      ("e1", "order", 42.0, 7L, "plain"),
      ("e2", "click", 0.5, -1L, "quote\" back\\slash nl\n"),
      ("e3", "refund", 1234.25, 0L, "unicode é € 中"))
      .toDF("event_id", "event_type", "amount", "seq", "note")
      .withColumn("maybe_null", when(col("event_id") === "e2", lit("x")))
    val got: Seq[Array[Byte]] = conn.wrap(rows).as[String].collect().toSeq
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val golden: Seq[Array[Byte]] = Seq(
      """{"event_id":"e1","event_type":"order","amount":42.0,"seq":7,"note":"plain"}""",
      "{\"event_id\":\"e2\",\"event_type\":\"click\",\"amount\":0.5,\"seq\":-1," +
        "\"note\":\"quote\\\" back\\\\slash nl\\n\",\"maybe_null\":\"x\"}",
      """{"event_id":"e3","event_type":"refund","amount":1234.25,"seq":0,"note":"unicode é € 中"}""")
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(got.size == golden.size)
    got.zip(golden).foreach { case (g, e) =>
      assert(java.util.Arrays.equals(g, e),
        s"wire bytes diverge:\n got=${new String(g, "UTF-8")}\n exp=${new String(e, "UTF-8")}")
    }
  }

  test("golden fixtures round-trip: unwrap recovers event_type from exact wire bytes") {
    // consume leg against the same pinned bytes, shaped as a Kafka
    // source row (key/value binary + metadata) — proves a payload
    // produced by ANY client following the fixture contract parses
    val conn = new KafkaConnector("unused:9092")
    val wire = """{"event_id":"e9","event_type":"order","amount":9.75,"note":"né\n"}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val df = Seq((("k9".getBytes("UTF-8")): Array[Byte], wire))
      .toDF("key", "value")
      .withColumn("topic", lit("orders")).withColumn("partition", lit(3))
      .withColumn("offset", lit(21L)).withColumn("timestamp", current_timestamp())
    val row = conn.unwrap(df).collect().head
    assert(row.getAs[String]("event_type") == "order")
    assert(row.getAs[String]("key") == "k9")
    assert(row.getAs[String]("payload") == new String(wire, "UTF-8"))
    assert(row.getAs[Int]("partition") == 3 && row.getAs[Long]("offset") == 21L)
  }

  test("wrap serializes all columns into value; unwrap restores payload + event_type") {
    val conn = new KafkaConnector("unused:9092")
    val out = Seq(("e1", "order", 42.0)).toDF("event_id", "event_type", "amount")

    val wrapped = conn.wrap(out)
    assert(wrapped.columns.toSeq == Seq("value"))
    val valueJson = wrapped.as[String].head()
    assert(valueJson.contains("\"event_id\":\"e1\"") && valueJson.contains("\"amount\":42.0"))

    // shape of a kafka source row: key/value binary + metadata cols
    val sourceShaped = wrapped.select(
      lit("e1").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit("orders").as("topic"), lit(0).as("partition"), lit(7L).as("offset"),
      current_timestamp().as("timestamp"))
    val row = conn.unwrap(sourceShaped).collect().head
    assert(row.getAs[String]("payload") == valueJson)
    assert(row.getAs[String]("event_type") == "order") // extracted from the payload
    assert(row.getAs[String]("key") == "e1")
    assert(row.getAs[Long]("offset") == 7L)
  }

  test("live-leg detection: absent in this environment, present with the provider loadable") {
    // this container ships no spark-sql-kafka jar — detection must say so
    assert(!KafkaConnector.liveAvailable)
    assert(new KafkaConnector("unused:9092").live == false)
    // a classloader that CAN resolve the provider class flips detection
    // without any code change — the config-only activation contract
    val planted = new ClassLoader() {
      override def loadClass(name: String, resolve: Boolean): Class[_] =
        if (name == KafkaConnector.ProviderClass) classOf[String]
        else super.loadClass(name, resolve)
    }
    assert(KafkaConnector.liveAvailable(planted))
  }

  test("live route targets the real kafka source; fallback route serves the same envelope") {
    // LIVE (forced): the read must attempt the real kafka DSv2 source —
    // in this jar-less environment that's a data-source-not-found
    // failure naming kafka, proving the route
    val liveConn = new KafkaConnector("unused:9092", liveOverride = Some(true))
    val err = intercept[Exception](liveConn.readBatch(spark, "orders"))
    assert(err.getMessage.toLowerCase.contains("kafka"))

    // FALLBACK: same envelope through the graftlog broker emulation,
    // end to end — wrap bytes land as record values, reads surface
    // unwrap's exact columns
    val root = java.nio.file.Files.createTempDirectory("kafka_fb").toString
    val conn = new KafkaConnector("unused:9092",
      fallback = Some(new GraftLogConnector(root)), liveOverride = Some(false))
    val out = Seq(("e1", "order", 42.0), ("e2", "click", 0.5))
      .toDF("event_id", "event_type", "amount")
    conn.writeBatch(out, "orders")
    val rows = conn.readBatch(spark, "orders")
    assert(rows.columns.toSeq ==
      Seq("key", "payload", "event_type", "topic", "partition", "offset", "timestamp"))
    val got = rows.select("event_type", "payload", "topic").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("click", "order"))
    assert(got.forall(_._3 == "orders"))
    assert(got.head._2 == """{"event_id":"e2","event_type":"click","amount":0.5}""")

    // without a fallback the jar-less route fails fast and names the fix
    val bare = new KafkaConnector("unused:9092", liveOverride = Some(false))
    val e2 = intercept[IllegalStateException](bare.readBatch(spark, "orders"))
    assert(e2.getMessage.contains("spark-sql-kafka"))
  }
}
