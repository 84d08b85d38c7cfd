package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed stream-stream equi-join (reference: Joiner,
  * pspf/topology.py:49-102 — per-(side,key,window) state buffers with
  * probe into the opposing side's overlapping windows).
  *
  * Spark expresses the identical contract declaratively: watermark both
  * sides, equi-key plus a time-range condition; the engine owns the
  * buffering, co-partitioning, and state expiry the reference hand-rolls
  * in its StateStore. At scale both sides shuffle once on the key and
  * state is bounded by the watermark horizon — the knob that matters at
  * 100 TB/day is `withinMs` × key cardinality.
  */
object StreamJoins {

  /** Inner join of events within ±withinMs on equal keys. Column names
    * must be distinct between the two sides. Works identically on
    * streaming and batch frames. */
  def windowed(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String, withinMs: Long,
               joinType: String = "inner"): DataFrame = {
    val cond = left(leftKey) === right(rightKey) &&
      right(rightTs) >= left(leftTs) - expr(s"interval $withinMs milliseconds") &&
      right(rightTs) <= left(leftTs) + expr(s"interval $withinMs milliseconds")
    left.join(right, cond, joinType)
  }

  /** Streaming form with watermarks applied (delay bounds state size).
    * Outer variants emit the unmatched side once the watermark passes
    * the join horizon. */
  def windowedStreaming(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTs: String, rightTs: String,
                        withinMs: Long, watermarkDelay: String,
                        joinType: String = "inner"): DataFrame =
    windowed(
      left.withWatermark(leftTs, watermarkDelay),
      right.withWatermark(rightTs, watermarkDelay),
      leftKey, rightKey, leftTs, rightTs, withinMs, joinType)

  /** Stream-static enrichment join (free in Spark, absent in the
    * reference — SURVEY §2.4): broadcast the static dim when small. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
