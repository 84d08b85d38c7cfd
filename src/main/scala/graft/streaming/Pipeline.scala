package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Time-window specs with the reference's millisecond-based API surface
  * (reference: pspf/processing/windows.py:18-65 — Tumbling/Sliding/
  * Session assigners). Assignment semantics are Spark's built-ins, which
  * the reference's own unit tests agree with (end-exclusive, sliding
  * backtracking, session gap merge) — verified in WindowSpec.
  */
sealed trait WindowLike {
  def toColumn(ts: Column): Column
}
final case class TumblingWindow(sizeMs: Long) extends WindowLike {
  def toColumn(ts: Column): Column = window(ts, s"$sizeMs milliseconds")
}
final case class SlidingWindow(sizeMs: Long, slideMs: Long) extends WindowLike {
  def toColumn(ts: Column): Column =
    window(ts, s"$sizeMs milliseconds", s"$slideMs milliseconds")
}
final case class SessionWindow(gapMs: Long) extends WindowLike {
  def toColumn(ts: Column): Column = session_window(ts, s"$gapMs milliseconds")
}

/** Fluent pipeline facade with the reference's DSL surface —
  * map/filter/route/window-aggregate/sink (reference: StreamBuilder,
  * pspf/processing/dsl.py:17-49; subscribe/emit facade,
  * pspf/stream.py:94-104,221-264).
  *
  * Unlike the reference's per-record interpreted closure chain
  * (dsl.py:40-45), every operation here extends ONE Catalyst plan, so
  * the whole chain compiles into fused codegen stages and the optimizer
  * sees through it (predicate pushdown through map, etc.).
  */
final class Pipeline private (private val df: DataFrame) {
  def toDF: DataFrame = df

  /** DSL `map` (dsl.py:17-20): expressed as column projections so it
    * stays inside codegen. */
  def mapColumns(cols: Column*): Pipeline = new Pipeline(df.select(cols: _*))
  def withColumnMapped(name: String, c: Column): Pipeline = new Pipeline(df.withColumn(name, c))

  /** DSL `filter` (dsl.py:22-29); None-propagation short-circuit is
    * null-safe predicate semantics here. */
  def where(p: Column): Pipeline = new Pipeline(df.filter(p))

  /** Typed escape hatch for genuine per-record logic. */
  def mapTyped[T: org.apache.spark.sql.Encoder, U: org.apache.spark.sql.Encoder](f: T => U): Pipeline =
    new Pipeline(df.as[T].map(f).toDF())

  /** Event-time watermark (reference tracks max_event_ts - delay per
    * worker, pspf/stream.py:391-393; Spark's is global and persisted —
    * the correct version of the same contract). */
  def watermarked(tsCol: String, delay: String): Pipeline =
    new Pipeline(df.withWatermark(tsCol, delay))

  /** Windowed aggregation (reference: stream.aggregate,
    * pspf/stream.py:325-347). Algebraic folds only — arbitrary folds go
    * through KeyedState.scala. */
  def windowAgg(w: WindowLike, ts: Column, keys: Seq[Column], aggs: Seq[Column]): Pipeline =
    new Pipeline(df.groupBy(w.toColumn(ts) +: keys: _*).agg(aggs.head, aggs.tail: _*))

  /** Terminal sink (dsl.py:31-49): write to a connector topic. */
  def sinkTo(c: Connector, topic: String, checkpoint: String,
             outputMode: String = "append"): StreamingQuery =
    c.writeStream(df, topic, checkpoint, outputMode)
}

object Pipeline {
  def apply(df: DataFrame): Pipeline = new Pipeline(df)
  def from(c: Connector, spark: SparkSession, topic: String): Pipeline =
    new Pipeline(c.readStream(spark, topic))
}

/** Predicate router (reference: Router, pspf/topology.py:10-46 —
  * ordered first-match predicate → topic, optional default, drop when no
  * match). The reference evaluates predicates per event in Python; here
  * the route is ONE when-chain column evaluated once per row inside
  * codegen, and fan-out writes each leg from one cached batch.
  */
final class StreamRouter(routes: Seq[(Column, String)], default: Option[String]) {

  /** First-match route name; null = drop (no default). */
  def routeColumn: Column = {
    routes.foldLeft[Option[Column]](None) {
      case (None, (p, t)) => Some(when(p, t))
      case (Some(acc), (p, t)) => Some(acc.when(p, t))
    } match {
      case Some(chain) => default.map(chain.otherwise(_)).getOrElse(chain)
      case None => lit(default.orNull) // no predicates: everything → default (or drop)
    }
  }

  def targets: Seq[String] = (routes.map(_._2) ++ default.toSeq).distinct

  /** Batch fan-out: route once, cache, write each leg. */
  def fanOutBatch(df: DataFrame, write: (DataFrame, String) => Unit): Unit = {
    val routed = df.withColumn("_route", routeColumn).cache()
    try targets.foreach { t =>
      val leg = routed.filter(col("_route") === t).drop("_route")
      if (!leg.isEmpty) write(leg, t) // no events for a topic → no write
    } finally routed.unpersist()
  }

  /** Streaming fan-out via foreachBatch (one query, N sinks — matches
    * SURVEY §2.2 O5's recommended plan). The callback receives the
    * batchId so sinks can write replay-idempotently
    * (Connector.writeBatchIdempotent). */
  def fanOutStream(df: DataFrame, checkpoint: String,
                   write: (DataFrame, String, Long) => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fanOutBatch(batch, (leg, t) => write(leg, t, batchId))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
