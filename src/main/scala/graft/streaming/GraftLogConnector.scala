package graft.streaming

import graft.sources.GraftLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Connector over graftlog topics — the live "real broker" leg of the
  * S1 contract (reference: ValkeyStreamBackend default backend,
  * pspf/connectors/valkey.py:83-389): partitioned append-only streams
  * with broker ids, consumer-group offsets (= Spark checkpoints), DLQ
  * side topics, and lag introspection, with zero external processes.
  *
  * Reads are fully distributed (one task per log partition, DSv2).
  * Produce is a client-side call like XADD — rows funnel through the
  * producer (the reference's emit is a single asyncio client too,
  * pspf/stream.py:221-264); high-volume produce belongs on a real
  * broker (KafkaConnector), not this emulation.
  */
final class GraftLogConnector(root: String, numPartitions: Int = 4,
                              keyCol: String = "key") extends Connector {
  private def path(topic: String) = s"$root/$topic"

  override def readStream(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.format("graftlog").load(path(topic))

  override def readBatch(spark: SparkSession, topic: String): DataFrame =
    spark.read.format("graftlog").load(path(topic))

  /** Envelope-aware produce: frames that already carry a string `value`
    * column append (key, event_type, value) as-is (re-produce / replay
    * shape); arbitrary frames are JSON-wrapped wholesale into `value`
    * with the key taken from `keyCol` when present (the reference
    * JSON-stringifies complex payloads the same way,
    * pspf/connectors/valkey.py:281-293). */
  override def writeBatch(df: DataFrame, topic: String): Unit = {
    val cols = df.columns.toSet
    // envelope path only for PURE envelope frames — anything carrying
    // extra columns (e.g. DLQ _error metadata) wraps wholesale so no
    // column is silently dropped
    val normalized =
      if (cols.contains("value") && df.schema("value").dataType ==
          org.apache.spark.sql.types.StringType &&
          cols.subsetOf(GraftLog.schema.fieldNames.toSet)) {
        df.select(
          (if (cols.contains("key")) col("key") else org.apache.spark.sql.functions.lit(null)).cast("string").as("key"),
          (if (cols.contains("event_type")) col("event_type") else org.apache.spark.sql.functions.lit(null)).cast("string").as("event_type"),
          col("value"))
      } else {
        val key = if (cols.contains(keyCol)) col(keyCol).cast("string")
          else if (cols.contains("key")) col("key").cast("string")
          else org.apache.spark.sql.functions.lit("default_key") // reference fallback key (pspf/stream.py:400)
        df.select(key.as("key"),
          org.apache.spark.sql.functions.lit(null).cast("string").as("event_type"),
          to_json(struct(df.columns.map(col): _*)).as("value"))
      }
    normalized.collect().foreach { r =>
      GraftLog.append(path(topic), numPartitions, r.getString(0), r.getString(2), r.getString(1))
    }
  }

  override def writeStream(df: DataFrame, topic: String, checkpoint: String,
                           outputMode: String): StreamingQuery =
    df.writeStream.outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => writeBatch(batch, topic) }
      .start()

  override def purgeTopic(spark: SparkSession, topic: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(topic))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(p) || fs.delete(p, true)
  }

  /** Consumer lag vs a checkpoint (reference XPENDING lag surface). */
  def lag(topic: String, checkpoint: String): Long =
    GraftLog.lag(path(topic), checkpoint)
}
