package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Parquet scans get predicate pushdown + column pruning from Catalyst;
  * at cluster scale these would be partitioned/bucketed table paths —
  * the loader is the single place that would change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The generator has shipped events.ts under two physical encodings
    // (TIMESTAMP(NANOS), which Spark 4 only reads as raw int64 under the
    // legacy flag, and µs TIMESTAMP_NTZ); normalizeTs absorbs either.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** THE events-timestamp normalizer: every consumer of a raw `ts`
    * column — batch loads, streaming file sources, specs — routes
    * through here, so a generator-side change of the physical encoding
    * is absorbed in exactly one place. Output is always a session-zone
    * (UTC — GraftSession pins it) `TimestampType` column:
    *  - int64 epoch-nanos (the nanosAsLong read of TIMESTAMP(NANOS)):
    *    integral `div 1000` to µs — ns epochs exceed 2^53, a
    *    double-valued `/` would corrupt low-order digits;
    *  - µs TIMESTAMP_NTZ: cast — epoch-exact under the UTC session zone,
    *    and the uniform LTZ output keeps `unix_micros`/interval
    *    arithmetic legal downstream (both are analysis errors over NTZ);
    *  - TimestampType: passthrough.
    * Purely a projection, so it works identically on batch and
    * streaming frames. Frames without a `ts` column pass through. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      case Some(TimestampType) | None => df
      case Some(other) =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported physical type $other (expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Register every table as a temp view so spark.sql(...) works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
