package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The events-timestamp normalizer must absorb every physical encoding
  * the generator has shipped: int64 epoch-nanos (what the legacy
  * nanosAsLong flag turns a TIMESTAMP(NANOS) column into) and µs
  * TIMESTAMP_NTZ — both through parquet round-trips, both landing on
  * the same canonical UTC TimestampType values. This is the round-8
  * regression gate for the testdata drift that broke w9/bench/3 specs.
  */
class TablesNormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // epoch-µs fixtures, deliberately not second-aligned
  private val micros = Seq(1700000000123456L, 1700003600987654L, 1700010000000001L)

  test("normalizeTs: ns-int64 and µs-NTZ parquet fixtures normalize to identical TimestampType values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_fixtures")
    // ns-int64 fixture: a LongType `ts` column is byte-for-byte the
    // post-read state of a TIMESTAMP(NANOS) file under nanosAsLong
    val nsPath = dir.resolve("ns").toString
    micros.map(us => (us * 1000L, "e")).toDF("ts", "tag")
      .write.mode("overwrite").parquet(nsPath)
    // µs-NTZ fixture: TimestampNTZType writes TIMESTAMP_NTZ parquet
    // (isAdjustedToUTC=false), which Spark 4 reads back as NTZ
    val ntzPath = dir.resolve("ntz").toString
    micros.map(us => (us, "e")).toDF("us", "tag")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("tag"))
      .write.mode("overwrite").parquet(ntzPath)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nsRead = spark.read.parquet(nsPath)
    val ntzRead = spark.read.parquet(ntzPath)
    assert(nsRead.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    assert(ntzRead.schema("ts").dataType == TimestampNTZType)

    def norm(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val n = Tables.normalizeTs(df)
      assert(n.schema("ts").dataType == TimestampType)
      n.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    }
    assert(norm(nsRead) == micros)
    assert(norm(ntzRead) == micros)
  }

  test("normalizeTs: TimestampType passes through; frames without ts pass through; other types throw") {
    val ltz = micros.map(us => Tuple1(us)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeTs(ltz).schema("ts").dataType == TimestampType)
    val noTs = Seq((1L, "a")).toDF("id", "v")
    assert(Tables.normalizeTs(noTs).schema == noTs.schema)
    val bad = Seq(Tuple1("not-a-time")).toDF("ts")
    intercept[IllegalArgumentException](Tables.normalizeTs(bad))
  }
}
