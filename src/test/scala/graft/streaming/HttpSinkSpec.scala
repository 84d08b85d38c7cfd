package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

/** Concrete HttpSink against an in-process HTTP server (reference:
  * pspf/connectors/http.py:10-49 + tests/connectors/test_sink.py:20-40 —
  * POST with X-Idempotency-Key, raise-for-status → retry, idempotent
  * skip counting). No network egress: the server binds loopback inside
  * the test JVM.
  */
class HttpSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("posts once per event id with idempotency key; 5xx fails the batch then retry delivers") {
    val keys = new ConcurrentLinkedQueue[String]()
    val bodies = new ConcurrentLinkedQueue[String]()
    val failMode = new AtomicBoolean(false)
    val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sink", (ex: com.sun.net.httpserver.HttpExchange) => {
      // no asserts on the server thread — a failure there surfaces as an
      // opaque connection error; record and assert from the test thread
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      val code = if (failMode.get()) 500 else 200
      if (code == 200) keys.add(ex.getRequestHeaders.getFirst("X-Idempotency-Key"))
      ex.sendResponseHeaders(code, 0)
      ex.getResponseBody.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/sink"
      val tokenDir = Files.createTempDirectory("graft_http_tok").toString
      val sink = new HttpSink("orders", tokenDir, url)

      val n1 = sink.write(spark, Seq(("e1", "x"), ("e2", "y")).toDF("event_id", "payload"), "event_id")
      assert(n1 == 2)
      assert(keys.toArray.toSet == Set("orders:e1", "orders:e2"))
      assert(bodies.toArray(Array.empty[String]).forall(_.contains("event_id"))) // full-row JSON payloads

      // redelivery batch: e2 already has a token → one delivery only
      val n2 = sink.write(spark, Seq(("e2", "y"), ("e3", "z")).toDF("event_id", "payload"), "event_id")
      assert(n2 == 1)
      assert(keys.size == 3)

      // non-2xx raises (reference raise_for_status) → batch fails, NO
      // token recorded; the retried batch delivers
      failMode.set(true)
      intercept[Exception] {
        sink.write(spark, Seq(("e4", "w")).toDF("event_id", "payload"), "event_id")
      }
      failMode.set(false)
      val n3 = sink.write(spark, Seq(("e4", "w")).toDF("event_id", "payload"), "event_id")
      assert(n3 == 1)
      assert(keys.toArray.count(_ == "orders:e4") == 1)
    } finally server.stop(0)
  }
}
