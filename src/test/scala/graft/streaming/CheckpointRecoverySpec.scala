package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Exactly-once across restart from checkpoint — the Spark analog of the
  * reference's crash-recovery proof (reference:
  * tests/test_crash_recovery.py:20-130 — worker dies mid-stream, a second
  * worker resumes, no loss, no double-processing, sum exact).
  */
class CheckpointRecoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("restart from checkpoint processes each record exactly once (sum 45)") {
    val root = Files.createTempDirectory("graft_eos").toString
    val schema = StructType(Seq(
      StructField("tx_id", StringType), StructField("val", LongType)))
    val conn = new FileConnector(root, schema)
    val checkpoint = s"$root/ckpt"
    val outDir = s"$root/out"

    def runOnce(): Unit = {
      val q = conn.readStream(spark, "txs")
        .writeStream.option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .format("parquet").start(outDir)
      q.awaitTermination()
    }

    // first worker: tx_0..tx_4, then "crash" (query stops)
    (0 until 5).map(i => (s"tx_$i", i.toLong)).toDF("tx_id", "val")
      .write.mode("append").json(s"$root/txs")
    runOnce()

    // second worker: tx_5..tx_9 arrive; resume from the same checkpoint
    (5 until 10).map(i => (s"tx_$i", i.toLong)).toDF("tx_id", "val")
      .write.mode("append").json(s"$root/txs")
    runOnce()

    val out = spark.read.schema(schema).parquet(outDir)
    assert(out.count() == 10) // no loss, no dupes
    assert(out.agg(sum("val")).as[Long].head() == 45L)
    assert(out.select("tx_id").distinct().count() == 10)
  }
}
