package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.{Failure, Success, Try}

/** The reliability layer: per-row retry→DLQ, DLQ metadata enrichment,
  * idempotent sinks, late-event side output, DLQ replay.
  *
  * Reference semantics preserved / mechanism made idiomatic:
  *  - per-message retry count + DLQ after max (pspf/processor.py:349-380,
  *    default max_retries=3 pspf/settings.py:38): Spark retries whole
  *    tasks, so row-level retry happens in-batch with the same
  *    exponential-backoff schedule, and terminal failures are enriched
  *    and appended to `{topic}-dlq` within the same foreachBatch.
  *  - DLQ enrichment `_error/_original_stream/_original_msg_id/
  *    _moved_timestamp` (pspf/connectors/valkey.py:222-248).
  *  - idempotent sink: token check-execute-record around the side effect
  *    (pspf/connectors/base.py:48-70) → in-batch dropDuplicates + durable
  *    token-set anti-join. Token store here is a parquet directory; at
  *    cluster scale the same contract is a Delta table or KV store, and
  *    the anti-join broadcasts the recent-token window instead of the
  *    full history.
  *  - DLQ replay: strip `_`-metadata, re-append to main topic
  *    (pspf/cli.py:139-179, pspf/utils/replay.py:12-51).
  */
object Reliability {

  /** Reference DLO_MAX_RETRIES default 3, overridable via
    * GRAFT_MAX_RETRIES / legacy DLO_MAX_RETRIES env
    * (pspf/settings.py:38) — resolved once per JVM. */
  lazy val DefaultMaxRetries: Int = graft.GraftSettings.fromEnv().maxRetries

  /** The DLQ enrichment columns (annotateWithRetry's _error plus
    * enrichForDlq's provenance) — single source of truth, referenced by
    * connectors when deriving a DLQ topic's read schema. */
  val dlqMetaFields: Seq[StructField] = Seq(
    StructField("_error", StringType),
    StructField("_original_stream", StringType),
    StructField("_original_msg_id", StringType),
    StructField("_moved_timestamp", org.apache.spark.sql.types.TimestampType))

  /** Reference's backoff schedule (pspf/processor.py:368-373), computed
    * deterministically (the reference adds random jitter to sleep time —
    * timing, not semantics). */
  def backoffMs(attempt: Int, baseMs: Long = 100L): Long =
    baseMs * (1L << math.min(attempt, 10))

  /** Annotate each row with `_error` (null on success) after running `op`
    * with up to `maxRetries` in-batch retries. Runs on executors inside
    * mapPartitions — the driver never sees rows. */
  def annotateWithRetry(df: DataFrame, maxRetries: Int)(op: Row => Unit): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("_error", StringType))
    df.mapPartitions { it =>
      it.map { row =>
        var attempt = 0
        var err: String = null
        var done = false
        while (!done && attempt <= maxRetries) {
          Try(op(row)) match {
            case Success(_) => done = true; err = null
            case Failure(e) =>
              err = s"${e.getClass.getSimpleName}: ${e.getMessage}"
              attempt += 1 // a live sink would sleep backoffMs(attempt) here
          }
        }
        Row.fromSeq(row.toSeq :+ (if (done) null else err))
      }
    }(Encoders.row(outSchema))
  }

  /** DLQ enrichment, matching the reference's metadata keys. */
  def enrichForDlq(failed: DataFrame, topic: String, idCol: String): DataFrame =
    failed
      .withColumn("_original_stream", lit(topic))
      .withColumn("_original_msg_id", col(idCol).cast("string"))
      .withColumn("_moved_timestamp", current_timestamp())

  /** Reliable foreachBatch body (a (batch, batchId) => Unit for
    * writeStream.foreachBatch): per-row op with retry; terminal failures
    * land enriched in `{topic}-dlq`. Outcomes are observable via the DLQ
    * itself and GraftMetrics, not a return value. `writerId` scopes the
    * DLQ write's replay idempotency to this subscription. */
  def reliableBatch(c: Connector, topic: String, idCol: String,
                    maxRetries: Int = DefaultMaxRetries,
                    writerId: String = "reliable")(op: Row => Unit)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // persist (memory+disk) so the failure scan doesn't re-run `op`;
      // the DLQ write is batchId-idempotent → crash-replay leaves one copy
      val results = annotateWithRetry(batch, maxRetries)(op)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val failed = results.filter(col("_error").isNotNull)
        if (!failed.isEmpty)
          c.writeBatchIdempotent(enrichForDlq(failed, topic, idCol),
            c.dlqTopic(topic), batchId, writerId)
      } finally results.unpersist()
    }

  /** Idempotent write: skip rows whose id already holds a token; record
    * new tokens after the side effect (reference token
    * `pspf:sink:{name}:{event_id}`, TTL'd — base.py:48-53, default
    * ttl_seconds=86400). Returns rows written.
    *
    * TTL / bounded state: with `ttlMs` set, tokens land in time-bucketed
    * subdirs (`bucket=<epochMs>`, bucket width = ttl). Each batch reads
    * ONLY the buckets that can still hold unexpired tokens (at most 2)
    * and deletes fully-expired ones — so the anti-join input is bounded
    * by the id volume of ~2 TTL windows forever, instead of the full
    * history. Dedup is guaranteed for at LEAST ttl after a write and at
    * most 2·ttl (lazy bucket-granularity eviction — same
    * approximate-over-never-under contract as the reference's lazy TTL
    * eviction, pspf/state/backends/rocksdb_store.py:92-126). Without
    * `ttlMs` the token set is flat and unbounded (full-history dedup).
    *
    * Granularity caveat: tokens commit once per BATCH, after the whole
    * side effect succeeds. A mid-batch failure records no tokens, so the
    * retried batch re-sends rows that already went out — at-least-once
    * under partial failure, exactly-once across successful batches. (The
    * reference has the same window per event rather than per batch.)
    * Closing it fully needs a transactional token store (Delta / KV with
    * per-row commit) — a storage swap, not a shape change. */
  def idempotentWrite(spark: SparkSession, batch: DataFrame, idCol: String,
                      tokenDir: String, ttlMs: Option[Long] = None,
                      nowMs: () => Long = () => System.currentTimeMillis())(
                      write: DataFrame => Unit): Long = {
    val inBatch = batch.dropDuplicates(idCol)
    // Only a MISSING token dir means "no tokens yet" — any other read
    // failure (transient storage error, corrupt file) must fail the
    // batch, not silently disable idempotency and re-fire history.
    val tokenPath = new org.apache.hadoop.fs.Path(tokenDir)
    val fs = tokenPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (readPaths: Seq[String], writeDir: String) = ttlMs match {
      case None =>
        (if (fs.exists(tokenPath)) Seq(tokenDir) else Nil, tokenDir)
      case Some(ttl) =>
        require(ttl > 0, s"ttlMs must be positive, got $ttl")
        val now = nowMs()
        val bucket = now - (now % ttl)
        val dirs =
          if (!fs.exists(tokenPath)) Nil
          else fs.listStatus(tokenPath).toSeq.filter(_.isDirectory).flatMap { st =>
            val nm = st.getPath.getName
            if (nm.startsWith("bucket="))
              scala.util.Try(nm.stripPrefix("bucket=").toLong).toOption.map(_ -> st.getPath)
            else None
          }
        // bucket b holds tokens written in [b, b+ttl); the youngest of
        // them expires at b + 2·ttl — older buckets are deleted, live
        // ones are the entire anti-join input
        val (live, dead) = dirs.partition { case (b, _) => b + 2 * ttl > now }
        dead.foreach { case (_, p) => fs.delete(p, true) }
        (live.map(_._2.toString), s"$tokenDir/bucket=$bucket")
    }
    val fresh =
      if (readPaths.isEmpty) inBatch
      else {
        // explicit schema: a crash can leave tokenDir with only an
        // uncommitted _temporary dir, where schema inference would throw
        // forever and wedge every batch; with a declared schema that
        // state reads as an empty token set
        val tok = spark.read
          .schema(org.apache.spark.sql.types.StructType(Seq(StructField("token_id", StringType))))
          .parquet(readPaths: _*)
        // compare as strings — tokens persist as strings, and a
        // numeric-vs-string equality would coerce to double, corrupting
        // ids beyond 2^53
        inBatch.join(tok, inBatch(idCol).cast("string") === tok("token_id"), "left_anti")
      }
    val freshC = fresh.cache()
    try {
      val n = freshC.count()
      if (n > 0) {
        write(freshC)
        freshC.select(col(idCol).cast("string").as("token_id"))
          .write.mode("append").parquet(writeDir)
      }
      n
    } finally freshC.unpersist()
  }

  /** Late-event side output (reference: pspf/stream.py:402-413 — events
    * older than the watermark go to `{topic}-late` instead of Spark's
    * silent drop). Split on a watermark the caller reads from
    * `StreamingQueryProgress.eventTime` (one-batch lag vs the reference's
    * per-event check — documented divergence). Returns (onTime, late). */
  def lateSplit(batch: DataFrame, tsCol: String, watermark: java.sql.Timestamp)
      : (DataFrame, DataFrame) =
    // null event-times go to the LATE leg — both filters would otherwise
    // drop them (SQL null comparisons), which is exactly the silent loss
    // this helper exists to prevent
    (batch.filter(col(tsCol) >= lit(watermark)),
      batch.filter(col(tsCol) < lit(watermark) || col(tsCol).isNull))

  /** W6 end-to-end: split a batch on the watermark and write the late
    * leg to `{topic}-late` (batchId-idempotent), returning the on-time
    * leg for the caller's aggregation path. This is the full reference
    * behavior (route late raw events to the side topic instead of
    * dropping, pspf/stream.py:402-413) packaged for foreachBatch. */
  def lateSideOutput(c: Connector, topic: String, batch: DataFrame, tsCol: String,
                     watermark: java.sql.Timestamp, batchId: Long,
                     writerId: String = "late"): DataFrame = {
    val (onTime, late) = lateSplit(batch, tsCol, watermark)
    if (!late.isEmpty) c.writeBatchIdempotent(late, c.lateTopic(topic), batchId, writerId)
    onTime
  }

  /** DLQ replay: strip `_`-prefixed metadata, re-append to the main
    * topic, then PURGE the DLQ (the reference deletes each replayed
    * message, pspf/utils/replay.py — without the purge a second replay
    * would duplicate every event). A crash between append and purge
    * re-replays on the next run: at-least-once, same as the reference's
    * per-message re-inject-then-delete. */
  def replayDlq(spark: SparkSession, c: Connector, topic: String): Long = {
    val dlq = c.readBatch(spark, c.dlqTopic(topic))
    // strip exactly the DLQ metadata family (connector-owned: columns
    // for column-shaped topics, in-payload keys for envelope brokers) —
    // NOT every underscore column, which would destroy unrelated
    // context the row carries (e.g. Trace's _trace_id, which must
    // survive a DLQ round-trip the way the reference's in-payload trace
    // context does)
    val clean = c.stripDlqMeta(dlq)
    val cleanC = clean.cache()
    try {
      val n = cleanC.count()
      if (n > 0) {
        c.writeBatch(cleanC, topic)
        c.purgeTopic(spark, c.dlqTopic(topic))
      }
      n
    } finally cleanC.unpersist()
  }
}
