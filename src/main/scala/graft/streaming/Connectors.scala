package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Connector contract (reference: StreamingBackend ABC,
  * pspf/connectors/base.py:80-174 — connect/read_batch/ack/add_event/DLQ).
  *
  * In Spark the read/ack/claim/checkpoint surface collapses into
  * readStream + checkpointLocation (offsets and state commit atomically
  * per micro-batch — the reference's hand-built EOS protocol,
  * pspf/state/store.py:52-64, is the engine default here). What remains
  * of the contract is topic→path/config resolution and the DLQ/late
  * side-topic naming convention.
  */
trait Connector {
  def readStream(spark: SparkSession, topic: String): DataFrame
  def readBatch(spark: SparkSession, topic: String): DataFrame
  def writeBatch(df: DataFrame, topic: String): Unit
  def writeStream(df: DataFrame, topic: String, checkpoint: String,
                  outputMode: String = "append"): StreamingQuery

  /** Batch-replay-safe write for foreachBatch side outputs: writing the
    * SAME (topic, batchId) twice must leave one copy (crash between a
    * side write and the micro-batch commit causes the engine to replay
    * the batch). Default falls back to plain append — at-least-once —
    * for connectors without an idempotent form. */
  def writeBatchIdempotent(df: DataFrame, topic: String, batchId: Long): Unit =
    writeBatch(df, topic)

  /** Delete a topic's storage (DLQ purge etc.). Default: unsupported. */
  def purgeTopic(spark: SparkSession, topic: String): Boolean =
    throw new UnsupportedOperationException(s"purge not supported by ${getClass.getSimpleName}")

  /** DLQ topic naming, as the reference's `{topic}-dlq`
    * (pspf/connectors/valkey.py:222-248). */
  final def dlqTopic(topic: String): String = s"$topic-dlq"
  /** Late-event side topic `{topic}-late` (pspf/stream.py:402-413). */
  final def lateTopic(topic: String): String = s"$topic-late"
}

/** File-backed topics: one directory per topic under `root`, NDJSON
  * (reference: FileStreamBackend, pspf/connectors/file.py:10-110 —
  * line-number offsets become Spark file-source offsets in the
  * checkpoint; the `.dlq` side file becomes a side directory).
  *
  * Scale: a directory-of-files topic is object-storage-native; listing
  * cost is controlled via maxFilesPerTrigger and compaction jobs.
  */
final class FileConnector(root: String, schema: StructType,
                          topicSchemas: Map[String, StructType] = Map.empty) extends Connector {
  private def path(topic: String) = s"$root/$topic"

  /** DLQ metadata appended by Reliability.enrichForDlq. */
  private val dlqMeta = Seq(
    org.apache.spark.sql.types.StructField("_error", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_original_stream", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_original_msg_id", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_moved_timestamp", org.apache.spark.sql.types.TimestampType))

  /** Per-topic schema: explicit override > DLQ topics get base+metadata
    * (so enrichment survives the read) > base schema. Derived topics
    * with a different shape (agg outputs etc.) need an override entry. */
  private def schemaOf(topic: String): StructType =
    topicSchemas.getOrElse(topic,
      if (topic.endsWith("-dlq")) StructType(schema.fields ++ dlqMeta) else schema)

  override def readStream(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.schema(schemaOf(topic))
      .option("recursiveFileLookup", "true").json(path(topic))

  override def readBatch(spark: SparkSession, topic: String): DataFrame =
    spark.read.schema(schemaOf(topic))
      .option("recursiveFileLookup", "true").json(path(topic))

  override def writeBatch(df: DataFrame, topic: String): Unit =
    df.write.mode("append").json(s"${path(topic)}/append")

  /** Replay-safe: one subdirectory per batch id, overwritten wholesale on
    * replay, so a crashed-then-replayed foreachBatch leaves ONE copy. */
  override def writeBatchIdempotent(df: DataFrame, topic: String, batchId: Long): Unit =
    df.write.mode("overwrite").json(s"${path(topic)}/batch-$batchId")

  override def purgeTopic(spark: SparkSession, topic: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(topic))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(p) || fs.delete(p, true)
  }

  override def writeStream(df: DataFrame, topic: String, checkpoint: String,
                           outputMode: String): StreamingQuery =
    df.writeStream.outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format("json").start(path(topic))
}

/** Kafka wiring (reference: KafkaStreamBackend,
  * pspf/connectors/kafka.py:20-271). Manual commit / max-offset logic
  * (:149-190) is subsumed by the checkpoint; consumer lag (:230-270) is
  * observable via StreamingQueryProgress. NOTE: requires the
  * spark-sql-kafka package on the classpath (not shipped in this
  * environment — construction succeeds, start() would fail fast). */
final class KafkaConnector(bootstrap: String) extends Connector {
  override def readStream(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  override def readBatch(spark: SparkSession, topic: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()

  override def writeBatch(df: DataFrame, topic: String): Unit =
    df.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  override def writeStream(df: DataFrame, topic: String, checkpoint: String,
                           outputMode: String): StreamingQuery =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
      .start()
}

/** In-memory topics for tests (reference: MemoryBackend,
  * pspf/connectors/memory.py:10-160). Reads are backed by
  * `MemoryStream` created by the test (passed in), writes land in
  * `memory` sink tables named after the topic. Batch writes APPEND and
  * are materialized at write time (a lazy temp view would both replace
  * earlier batches and re-execute the producing plan on every read). */
final class MemoryConnector(streams: Map[String, DataFrame]) extends Connector {
  private val batches =
    scala.collection.concurrent.TrieMap.empty[String, Vector[Array[Row]]]
  private val schemas =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  override def readStream(spark: SparkSession, topic: String): DataFrame =
    streams.getOrElse(topic,
      throw new IllegalArgumentException(s"no memory stream registered for topic $topic"))

  override def readBatch(spark: SparkSession, topic: String): DataFrame = {
    val schema = schemas.getOrElse(topic,
      throw new IllegalArgumentException(s"memory topic $topic has no data"))
    val rows = batches.getOrElse(topic, Vector.empty).flatten
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  override def writeBatch(df: DataFrame, topic: String): Unit = {
    val rows = df.collect()
    schemas.putIfAbsent(topic, df.schema)
    batches.synchronized {
      batches.put(topic, batches.getOrElse(topic, Vector.empty) :+ rows)
    }
  }

  override def writeStream(df: DataFrame, topic: String, checkpoint: String,
                           outputMode: String): StreamingQuery =
    df.writeStream.outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName(topic.replace('-', '_'))
      .trigger(Trigger.AvailableNow())
      .start()
}
