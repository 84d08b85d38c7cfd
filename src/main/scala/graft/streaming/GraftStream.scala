package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** User-facing facade with the reference's `Stream` API surface
  * (reference: pspf/stream.py — emit :221-264, subscribe :94-104,
  * window/aggregate :106-118/:325-347, run model :120-159), so a
  * reference user can switch with the same mental model:
  *
  *   val s = new GraftStream(spark, connector, ckptRoot)
  *   s.emit(df, "orders")                       // produce
  *   s.subscribe("orders") { batch => ... }     // per-batch handler
  *   s.windowAggregate("orders", TumblingWindow(60000), $"ts",
  *     Seq($"key"), Seq(sum($"v").as("total")), "orders-agg")
  *
  * Each subscription is its own StreamingQuery (the reference spawns an
  * asyncio task per subscription — same topology, real engine). All
  * queries checkpoint under `checkpointRoot/<topic>/<name>` giving each
  * its own exactly-once offset+state log.
  */
final class GraftStream(spark: SparkSession, connector: Connector,
                        checkpointRoot: String, registry: SchemaRegistry = new SchemaRegistry) {

  private def ckpt(topic: String, name: String) = s"$checkpointRoot/$topic/$name"

  def schemas: SchemaRegistry = registry

  /** Produce rows to a topic (reference emit: normalize + route to
    * backend append). With `traced`, trace-context columns are injected
    * before the append (reference injects OTel context into every
    * emitted payload, pspf/stream.py:249-251 / telemetry.py:108-112);
    * consumers see them as ordinary columns and DLQ/replay preserve
    * them. */
  def emit(df: DataFrame, topic: String, traced: Boolean = false): Unit =
    connector.writeBatch(if (traced) Trace.inject(df) else df, topic)

  /** Per-batch handler subscription (reference subscribe + handler
    * arity dispatch → one foreachBatch). Registered schemas are applied
    * first: handler sees `parsed` + `_corrupt` columns. */
  def subscribe(topic: String, name: String = "main")(
      handler: (DataFrame, Long) => Unit): StreamingQuery =
    registry.parse(connector.readStream(spark, topic))
      .writeStream
      .option("checkpointLocation", ckpt(topic, s"sub-$name"))
      .foreachBatch(handler)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Declarative transform subscription: transform → sink topic
    * (reference DSL map/filter/sink chain). */
  def pipe(fromTopic: String, toTopic: String, name: String = "pipe")(
      transform: DataFrame => DataFrame): StreamingQuery =
    connector.writeStream(
      transform(connector.readStream(spark, fromTopic)),
      toTopic, ckpt(fromTopic, s"$name-$toTopic"))

  /** Windowed aggregation to a sink topic (reference @stream.window /
    * stream.aggregate with watermark_delay_ms). `prepare` derives the
    * event-time column (named `tsColName`) from raw topic rows
    * (reference's event-time extraction, pspf/stream.py:372-389); the
    * window and the watermark both bind to that one column — separate
    * parameters previously allowed them to disagree, which fails at
    * start() or never evicts state. */
  def windowAggregate(topic: String, w: WindowLike, keys: Seq[Column],
                      aggs: Seq[Column], outTopic: String,
                      watermarkDelay: String = "0 seconds",
                      tsColName: String = "ts",
                      prepare: DataFrame => DataFrame = identity): StreamingQuery = {
    val agg = Pipeline(prepare(connector.readStream(spark, topic)))
      .watermarked(tsColName, watermarkDelay)
      .windowAgg(w, col(tsColName), keys, aggs)
      .toDF
    connector.writeStream(agg, outTopic, ckpt(topic, s"agg-$outTopic"), "append")
  }

  /** Predicate routing to per-route topics (reference Router.route).
    * Legs are written batchId-idempotently, scoped by the router name →
    * crash-replay-safe and collision-free across routers. */
  def route(topic: String, router: StreamRouter, name: String = "router"): StreamingQuery =
    router.fanOutStream(
      connector.readStream(spark, topic), ckpt(topic, name),
      (leg, t, batchId) => connector.writeBatchIdempotent(leg, t, batchId, s"$topic-$name"))

  /** Reliable side-effect subscription: per-row op, retries, DLQ
    * (reference BatchProcessor error handling). */
  def subscribeReliable(topic: String, idCol: String, name: String = "reliable",
                        maxRetries: Int = Reliability.DefaultMaxRetries)(
      op: org.apache.spark.sql.Row => Unit): StreamingQuery =
    connector.readStream(spark, topic)
      .writeStream
      .option("checkpointLocation", ckpt(topic, s"rel-$name"))
      .foreachBatch(Reliability.reliableBatch(connector, topic, idCol, maxRetries,
        writerId = s"$topic-rel-$name")(op))
      .trigger(Trigger.AvailableNow())
      .start()
}

object GraftStream {
  /** Settings-driven construction: the checkpoint root comes from
    * GRAFT_CHECKPOINT_ROOT (reference settings-driven wiring,
    * pspf/settings.py — prod validation warns when it is missing). */
  def fromSettings(spark: SparkSession, connector: Connector,
                   settings: graft.GraftSettings): GraftStream =
    new GraftStream(spark, connector,
      settings.checkpointRoot.getOrElse(throw new IllegalArgumentException(
        "GRAFT_CHECKPOINT_ROOT must be set to build a GraftStream from settings")))
}
