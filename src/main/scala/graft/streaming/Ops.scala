package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational surface (reference: pspfctl CLI — dlq-inspect/dlq-purge
  * pspf/cli.py:181-228, replay :139-179, log inspect :18-55). Replay
  * itself lives in Reliability.replayDlq; these are the read/purge legs
  * as batch jobs.
  */
object Ops {

  /** Page through a DLQ (reference XRANGE paging → head over batch read). */
  def dlqInspect(spark: SparkSession, c: Connector, topic: String, limit: Int = 20): DataFrame =
    c.readBatch(spark, c.dlqTopic(topic)).limit(limit)

  def dlqCount(spark: SparkSession, c: Connector, topic: String): Long =
    c.readBatch(spark, c.dlqTopic(topic)).count()

  /** Drop all DLQ contents (reference DEL of the dlq key) — delegated to
    * the connector, which owns its topic→storage layout. */
  def dlqPurge(spark: SparkSession, c: Connector, topic: String): Boolean =
    c.purgeTopic(spark, c.dlqTopic(topic))

  /** Log inspect: `[offset] ts | key | value`-style ordered dump head
    * (reference pspfctl inspect). Caller picks the ordering column. */
  def inspect(spark: SparkSession, c: Connector, topic: String,
              orderCol: String, limit: Int = 20): DataFrame =
    c.readBatch(spark, topic).orderBy(col(orderCol)).limit(limit)

  /** Pause/resume (reference pspf/processor.py:54-62) maps to
    * query.stop() + restart from checkpoint; provided for API parity. */
  def pause(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = q.stop()

  /** Health / cluster status (reference cluster_api.py:13-28 — worker
    * health + cluster membership over HTTP): one row per ACTIVE
    * streaming query with its latest progress. In Spark the "cluster"
    * is the session's query set; per-executor liveness is the cluster
    * manager's surface. */
  def health(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq.map { q =>
      val p = Option(q.lastProgress)
      (q.id.toString, Option(q.name).getOrElse(""), q.isActive,
        p.map(_.batchId).getOrElse(-1L),
        p.map(_.numInputRows).getOrElse(0L),
        q.status.message)
    }.toDF("query_id", "name", "active", "last_batch", "last_input_rows", "status")
  }

  /** Interactive keyed-state query (reference: cluster_api.py:29-82 —
    * query live per-key state over HTTP with leader routing). Spark's
    * first-class answer is the state-store reader: point it at a running
    * (or stopped) query's checkpoint and get the keyed state as a
    * DataFrame — no custom RPC, no partition routing (the reader handles
    * partitioning), and it scales as a normal scan. Returns rows of
    * (key STRUCT, value STRUCT, partition_id); `flatten` unnests the
    * structs for quick inspection. */
  def stateQuery(spark: SparkSession, checkpoint: String,
                 operatorId: Int = 0, storeName: String = "default",
                 batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId)
      .option("storeName", storeName)
    batchId.foreach(b => r.option("batchId", b))
    r.load(checkpoint)
  }

  def stateQueryFlat(spark: SparkSession, checkpoint: String): DataFrame =
    stateQuery(spark, checkpoint)
      .select(col("partition_id"), col("key.*"), col("value.*"))
}

/** Idempotent external-effect sink (reference: BaseSink
  * pspf/connectors/base.py:32-78 + HttpSink pspf/connectors/http.py:10-49).
  * The side-effect function is pluggable (an HTTP POST with an
  * X-Idempotency-Key header in the reference); idempotency tokens are
  * durable in `tokenDir` keyed `{name}:{event_id}` — semantics of the
  * reference's `pspf:sink:{name}:{event_id}` Valkey keys.
  */
final class FunctionSink(name: String, tokenDir: String,
                         ttlMs: Option[Long] = None)(
    send: org.apache.spark.sql.Row => Unit) extends Serializable {

  /** Write a batch exactly once per event id: in-batch dedup + durable
    * token anti-join; rows that fail `send` throw (caller retries batch —
    * already-sent rows are skipped on redelivery via their tokens).
    * `ttlMs` bounds the token store (reference ttl_seconds=86400,
    * base.py:48-53) — see Reliability.idempotentWrite. */
  def write(spark: SparkSession, batch: DataFrame, idCol: String): Long =
    Reliability.idempotentWrite(spark, batch, idCol, s"$tokenDir/$name", ttlMs) { fresh =>
      fresh.foreach(r => send(r)) // runs on executors
    }
}

/** Concrete HTTP sink (reference: HttpSink pspf/connectors/http.py:10-49):
  * POST each event as JSON with an `X-Idempotency-Key: {name}:{event_id}`
  * header; non-2xx raises → the batch fails and is retried, with
  * already-delivered rows skipped via their durable tokens (and the
  * receiver can dedup on the idempotency key for the in-flight window).
  *
  * Executor-side delivery: one HttpClient per partition (connection
  * amortization), rows never pass through the driver. */
final class HttpSink(name: String, tokenDir: String, url: String,
                     timeoutMs: Long = 10000L, ttlMs: Option[Long] = None)
    extends Serializable {
  import org.apache.spark.sql.functions.{col, struct, to_json}

  def write(spark: SparkSession, batch: DataFrame, idCol: String): Long =
    Reliability.idempotentWrite(spark, batch, idCol, s"$tokenDir/$name", ttlMs) { fresh =>
      val sinkName = name; val sinkUrl = url; val tmo = timeoutMs
      fresh
        .select(col(idCol).cast("string").as("_id"),
          to_json(struct(fresh.columns.toIndexedSeq.map(col): _*)).as("_json"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val client = java.net.http.HttpClient.newBuilder()
            .connectTimeout(java.time.Duration.ofMillis(tmo)).build()
          it.foreach { r =>
            val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(sinkUrl))
              .timeout(java.time.Duration.ofMillis(tmo))
              .header("Content-Type", "application/json")
              .header("X-Idempotency-Key", s"$sinkName:${r.getString(0)}")
              .POST(java.net.http.HttpRequest.BodyPublishers.ofString(r.getString(1)))
              .build()
            val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
            // raise-for-status → batch retry (reference http.py:41-44)
            if (resp.statusCode() < 200 || resp.statusCode() >= 300)
              throw new java.io.IOException(
                s"HTTP ${resp.statusCode()} from $sinkUrl: ${resp.body().take(200)}")
          }
        }
    }
}
