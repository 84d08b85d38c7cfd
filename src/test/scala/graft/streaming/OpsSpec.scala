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
}
