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
    // must not depend on that call order)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file streaming source needs a directory; glob-filter to the table
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = aggregate(stream)
      .writeStream.outputMode("complete").format("memory").queryName("parity_out").start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("parity_out").collect().map(_.toSeq).toSet
      assert(streaming == batch && batch.nonEmpty)
    } finally q.stop()
  }
}
