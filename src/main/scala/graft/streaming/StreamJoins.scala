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

  /** Streaming as-of join: every left row paired with the key's most
    * recent right-side event time at-or-before it (j3's semantics; the
    * batch query's window formulation needs a finite frame, so the
    * streaming form carries ONE long per key — the latest right ts — in
    * flatMapGroupsWithState, exactly the "per-key running state" shape
    * the reference builds its Joiner state on, pspf/topology.py:49-102).
    *
    * Each micro-batch's group slice is sorted by (ts, right-before-left)
    * before folding, so in-batch disorder is handled and a same-ts right
    * event is visible to its left row (inclusive bound, ASOF contract).
    * Across batches arrival order is trusted: a right event arriving in
    * a LATER batch than a left event it should have matched cannot
    * retro-emit — the horizon trade-off every streaming as-of makes
    * (the batch formulation is the reconciliation run).
    *
    * `ts` may be a timestamp (converted to epoch micros) or an integral
    * micros column. Output: (id, ts_us, asof_ts_us nullable). Runs
    * identically on batch frames (GroupState backed by a plain agg). */
  def asofStreaming(left: DataFrame, right: DataFrame,
                    key: String, ts: String, id: String): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def micros(df: DataFrame): Column = df.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(df(ts))
      case _ => df(ts).cast("long")
    }
    // null hygiene (the tuple encoder's Long fields are non-nullable and
    // the fold dereferences id): left rows need key/ts/id, right rows
    // need key/ts — null-key right rows are dropped rather than grouped,
    // so a null-key left row emits None like the equi-join it mirrors
    // (null never equals null in a join)
    val l = left.select(col(key).cast("string").as("k"), micros(left).as("t"),
      lit(1).as("kind"), col(id).cast("long").as("id"))
      .filter(col("t").isNotNull && col("id").isNotNull)
    val r = right.select(col(key).cast("string").as("k"), micros(right).as("t"),
      lit(0).as("kind"), lit(null).cast("long").as("id"))
      .filter(col("t").isNotNull && col("k").isNotNull)
    l.unionByName(r).as[(String, Long, Int, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(String, Long, Int, Option[Long])],
         state: GroupState[Long]) =>
          val rows = it.toArray.sortBy(x => (x._2, x._3))
          var latest = state.getOption.getOrElse(Long.MinValue)
          val out = Seq.newBuilder[(Long, Long, Option[Long])]
          rows.foreach { case (_, t, kind, idOpt) =>
            if (kind == 0) latest = math.max(latest, t)
            else out += ((idOpt.get, t, if (latest == Long.MinValue) None else Some(latest)))
          }
          state.update(latest)
          out.result().iterator
      }
      .toDF("id", "ts_us", "asof_ts_us")
  }
}
