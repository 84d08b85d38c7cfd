package graft

import graft.streaming._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end demo of the streaming surface: file topic → schema
  * registry parse → router fan-out → windowed aggregation → reliable
  * sink with DLQ → replay. Run: sbt "runMain graft.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    val root = Files.createTempDirectory("graft_demo").toString
    println(s"[demo] topic root: $root")

    val schema = StructType(Seq(
      StructField("event_id", StringType), StructField("event_type", StringType),
      StructField("sec", DoubleType), StructField("amount", DoubleType),
      StructField("payload", StringType)))
    val conn = new FileConnector(root, schema)

    // 1. produce events to the 'tx' topic (one malformed payload)
    Seq(
      ("e1", "order", 5.0, 120.0, """{"item":"a"}"""),
      ("e2", "order", 8.0, 80.0, """{"item":"b"}"""),
      ("e3", "order", 15.0, 20000.0, """{"item":"c"}"""),
      ("e4", "refund", 6.0, 50.0, """not-json"""),
      ("e5", "order", 18.0, 500.0, """{"item":"d"}""")
    ).toDF("event_id", "event_type", "sec", "amount", "payload")
      .write.mode("append").json(s"$root/tx")

    // 2. schema registry: 'order' and 'refund' payloads are typed, so the
    // malformed refund payload gets flagged corrupt
    val reg = new SchemaRegistry
    reg.register("order", StructType(Seq(StructField("item", StringType))))
    reg.register("refund", StructType(Seq(StructField("reason", StringType))))
    val parsed = reg.parse(conn.readBatch(spark, "tx"))
    println("[demo] parsed + corrupt flags:")
    parsed.select("event_id", "event_type", "parsed", "_corrupt").show(false)

    // 3. router fan-out: high-value vs standard
    val router = new StreamRouter(
      Seq((col("amount") > lit(10000.0), "high_value_tx")), Some("standard_tx"))
    router.fanOutBatch(parsed, (leg, topic) => {
      println(s"[demo] route $topic -> ${leg.count()} events")
      conn.writeBatch(leg.select("event_id", "event_type", "sec", "amount", "payload"), topic)
    })

    // 4. streaming windowed aggregation over the standard leg
    val q = Pipeline(conn.readStream(spark, "standard_tx"))
      .withColumnMapped("ts", timestamp_seconds(col("sec")))
      .watermarked("ts", "0 seconds")
      .windowAgg(TumblingWindow(10000), col("ts"), Seq(col("event_type")),
        Seq(sum(col("amount")).as("total"), count(lit(1)).as("n")))
      .toDF
      .select(col("window.start").cast("long").as("ws"), col("event_type"), col("total"), col("n"))
      .writeStream.outputMode("complete").format("memory").queryName("agg_out").start()
    q.processAllAvailable(); q.stop()
    println("[demo] windowed aggregation of standard_tx:")
    spark.table("agg_out").orderBy("ws", "event_type").show()

    // 5. reliable sink: corrupt payloads explode → DLQ with metadata
    Reliability.reliableBatch(conn, "tx", "event_id") { row =>
      if (row.getAs[Boolean]("_corrupt")) throw new IllegalArgumentException("corrupt payload")
    }.apply(parsed, 0L)
    println("[demo] DLQ contents (via Ops.dlqInspect):")
    val dlqConn = new FileConnector(root, parsed.schema)
    Ops.dlqInspect(spark, dlqConn, "tx")
      .select("event_id", "_error", "_original_stream", "_original_msg_id").show(false)

    println(s"[demo] replayed ${Reliability.replayDlq(spark, conn, "tx")} DLQ events back to tx")

    // 6. the same flow through the user-facing facade (reference Stream API)
    val s = new GraftStream(spark, conn, s"$root/ckpt")
    val metrics = GraftMetrics.install(spark)
    s.emit(Seq(("f1", "order", 3.0, 42.0, """{"item":"z"}"""))
      .toDF("event_id", "event_type", "sec", "amount", "payload"), "facade_tx")
    s.pipe("facade_tx", "facade_big") { df => df.filter(col("amount") > 10.0) }
      .awaitTermination()
    s.subscribe("facade_big") { (batch, id) =>
      println(s"[demo] facade subscriber got batch $id with ${batch.count()} events")
    }.awaitTermination()
    println(s"[demo] metrics: messagesProcessed=${metrics.messagesProcessed.sum()} " +
      s"batches=${metrics.batchesCompleted.sum()}")

    // 7. the broker leg: graftlog DSv2 topic — produce with broker ids,
    // streaming drain with checkpointed consumer position, lag, and the
    // Ctl verbs over the same root
    val broker = new GraftLogConnector(s"$root/broker", numPartitions = 2, keyCol = "event_id")
    broker.writeBatch(Seq(("b1", 10.0), ("b2", 20.0), ("b3", 30.0)).toDF("event_id", "amount"), "orders")
    val bq = broker.readStream(spark, "orders")
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/broker-ckpt")
      .format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    bq.awaitTermination()
    println(s"[demo] graftlog consumer lag after drain: ${broker.lag("orders", s"$root/broker-ckpt")}")
    broker.writeBatch(Seq(("b4", 40.0)).toDF("event_id", "amount"), "orders")
    println(s"[demo] lag after producing one more: ${broker.lag("orders", s"$root/broker-ckpt")}")

    // 8. ops surface: keyed state from the agg checkpoint + pspfctl verbs
    println("[demo] Ctl state dump of the broker agg checkpoint:")
    Ctl.run(spark, root, "state", Array(s"$root/broker-ckpt", "5")).foreach(println)
    println("[demo] Ctl inspect of the broker topic (raw log records):")
    Ctl.run(spark, s"$root/broker", "inspect", Array("orders", "id", "5")).foreach(println)
    spark.stop()
  }
}
