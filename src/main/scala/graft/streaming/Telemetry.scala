package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Streaming telemetry (reference: Prometheus instruments
  * pspf/telemetry.py:16-51 — stream_messages_processed_total,
  * stream_processing_seconds, stream_lag — and the lag monitor loop
  * pspf/processor.py:260-281).
  *
  * A StreamingQueryListener receives every progress event; counters are
  * queryable in-process (export to Prometheus/StatsD is a transport
  * concern on top of this). Lag for file/kafka sources is visible via
  * numInputRows vs trigger cadence and the watermark timestamp.
  */
final class GraftMetrics extends StreamingQueryListener {
  val messagesProcessed = new LongAdder
  val batchesCompleted = new LongAdder
  private val lastByQuery = new ConcurrentHashMap[java.util.UUID, QueryProgressEvent]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    messagesProcessed.add(event.progress.numInputRows)
    batchesCompleted.increment()
    lastByQuery.put(event.progress.id, event)
  }

  // evict per-query state on termination: the facade starts a fresh
  // query (new UUID) per subscription run, so an unbounded map would
  // leak one progress event per run; counters survive eviction.
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    lastByQuery.remove(event.id)

  /** Latest watermark for a query (reference exposes per-handler
    * watermark; Spark's is global per query and persisted). */
  def watermarkOf(id: java.util.UUID): Option[String] =
    Option(lastByQuery.get(id)).flatMap(e => Option(e.progress.eventTime.get("watermark")))

  def processingRateOf(id: java.util.UUID): Option[Double] =
    Option(lastByQuery.get(id)).map(_.progress.processedRowsPerSecond)
}

object GraftMetrics {
  /** Install a fresh metrics listener on the session. */
  def install(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics
    spark.streams.addListener(m)
    m
  }

  /** Settings-gated install (reference: telemetry only starts when
    * OTEL_ENABLED / TelemetrySettings.ENABLED, pspf/settings.py:18-23,
    * pspf/telemetry.py). None when disabled. */
  def installIfEnabled(spark: SparkSession,
                       settings: graft.GraftSettings): Option[GraftMetrics] =
    if (settings.telemetry.enabled) Some(install(spark)) else None
}
