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
}

/** Idempotent external-effect sink (reference: BaseSink
  * pspf/connectors/base.py:32-78 + HttpSink pspf/connectors/http.py:10-49).
  * The side-effect function is pluggable (an HTTP POST with an
  * X-Idempotency-Key header in the reference); idempotency tokens are
  * durable in `tokenDir` keyed `{name}:{event_id}` — semantics of the
  * reference's `pspf:sink:{name}:{event_id}` Valkey keys.
  */
final class FunctionSink(name: String, tokenDir: String)(
    send: org.apache.spark.sql.Row => Unit) extends Serializable {

  /** Write a batch exactly once per event id: in-batch dedup + durable
    * token anti-join; rows that fail `send` throw (caller retries batch —
    * already-sent rows are skipped on redelivery via their tokens). */
  def write(spark: SparkSession, batch: DataFrame, idCol: String): Long =
    Reliability.idempotentWrite(spark, batch, idCol, s"$tokenDir/$name") { fresh =>
      fresh.foreach(r => send(r)) // runs on executors
    }
}
