package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Trace-context propagation (reference pspf/telemetry.py:108-118) and
  * connector plugin discovery (reference pspf/plugins.py:7-73). */
class TracePluginsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("inject mints trace+span ids; re-inject keeps the trace, reparents the span") {
    val df = Seq("e1", "e2").toDF("event_id")
    val t1 = Trace.inject(df).collect().map(r =>
      r.getAs[String]("event_id") -> (r.getAs[String]("_trace_id"), r.getAs[String]("_span_id"))).toMap
    assert(t1.values.forall { case (tid, sid) => tid != null && sid != null })
    assert(t1("e1")._1 != t1("e2")._1) // distinct flows → distinct traces

    val hop2 = Trace.inject(Trace.inject(df)).collect().head
    assert(hop2.getAs[String]("_parent_span_id") != null)
    assert(hop2.getAs[String]("_parent_span_id") != hop2.getAs[String]("_span_id"))
  }

  test("trace id survives emit → consume → DLQ → replay (the debugging story)") {
    val root = Files.createTempDirectory("graft_trace").toString
    val schema = StructType(Seq(
      StructField("event_id", StringType), StructField("_trace_id", StringType),
      StructField("_span_id", StringType), StructField("_parent_span_id", StringType)))
    val conn = new FileConnector(root, schema)
    val s = new GraftStream(spark, conn, s"$root/ckpt")

    s.emit(Seq("e1").toDF("event_id"), "orders", traced = true)
    val consumed = conn.readBatch(spark, "orders").collect().head
    val traceId = consumed.getAs[String]("_trace_id")
    assert(traceId != null)

    // fail everything → DLQ; enrichment must not clobber the trace
    Reliability.reliableBatch(conn, "orders", "event_id", maxRetries = 0) { _ =>
      throw new RuntimeException("boom")
    }.apply(conn.readBatch(spark, "orders"), 0L)
    val dlqRow = conn.readBatch(spark, conn.dlqTopic("orders")).collect().head
    assert(dlqRow.getAs[String]("_trace_id") == traceId)

    // replay strips ONLY dlq metadata; the trace context returns intact
    // (original + replayed copy both carry the trace id)
    Reliability.replayDlq(spark, conn, "orders")
    val withTrace = conn.readBatch(spark, "orders").collect()
      .count(_.getAs[String]("_trace_id") == traceId)
    assert(withTrace == 2)
  }

  test("ServiceLoader discovers connector plugins by short name") {
    val found = ConnectorPlugins.discover()
    assert(Set("file", "graftlog", "kafka").subsetOf(found.keySet))

    val root = Files.createTempDirectory("graft_plug").toString
    val conn = ConnectorPlugins.create("graftlog", Map("root" -> root, "numPartitions" -> "2"))
    conn.writeBatch(Seq(("k1", 1L)).toDF("key", "v"), "t")
    assert(conn.readBatch(spark, "t").count() == 1)

    val e = intercept[IllegalArgumentException] {
      ConnectorPlugins.create("bogus", Map.empty)
    }
    assert(e.getMessage.contains("graftlog"))
  }
}
