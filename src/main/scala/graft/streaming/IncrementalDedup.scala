package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Rolling-crawl incremental dedup: a streaming ingest loop in which
  * every micro-batch of new documents is MinHash-LSH-checked against
  * the band frames of EVERYTHING ingested before it, then contributes
  * its own band frame to that store. The seen side is the persisted
  * (id, band, bsig) parquet store written at ingest time — the
  * historical corpus text is never re-read or re-shingled, which is
  * what makes the loop viable when "history" is 100 TB of crawl drops
  * (per-batch cost: shingle the NEW docs + one band-bucket equi-join
  * against the store; the store itself is ~|docs|×bands 40-byte rows,
  * partitioned by ingest batch for pruning and compaction).
  *
  * Restart discipline (reference analog: the checkpoint-resume skip
  * check of `pspf/processor.py:303-328`): the streaming checkpoint
  * pins which source files belong to which micro-batch, and all writes
  * are batchId-keyed directory overwrites — a batch replayed after a
  * crash rewrites exactly its own partitions, and reads only store
  * partitions STRICTLY BEFORE its id, so its own partial output is
  * never its input. Exactly-once end to end without any sink-side
  * token state.
  */
object IncrementalDedup {

  /** LSH parameters of the loop; must stay constant for the lifetime
    * of a band store (mixed-parameter band frames don't bucket). */
  case class Config(id: String = "doc_id", text: String = "text",
                    shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2)

  private val BatchDirRe = "ingest_batch=(\\d+)".r

  private def batchDir(root: String, batchId: Long) = s"$root/ingest_batch=$batchId"

  /** Band-store partitions written by micro-batches BEFORE `beforeBatch`
    * — a replayed batch must not treat its own earlier (possibly
    * partial) write as seen corpus. None when no history exists. */
  def seenBands(spark: SparkSession, bandStoreDir: String,
                beforeBatch: Long): Option[DataFrame] = {
    val p = new Path(bandStoreDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      // ONE listing serves both checks — object-store listings at
      // scale are not free, and the two views never need to disagree
      val ls = fs.listStatus(p).toSeq.filter(_.isDirectory)
      // a compaction interrupted between its delete and rename leaves
      // history ONLY in the staged dot-dir — reading past it would
      // dedup against a hole and write permanently wrong verdicts.
      // The read path FAILS FAST instead of repairing (repair here
      // would make every reader a writer and race a still-running
      // compactor over the same renames); re-run compactBandStore to
      // complete the swap, then restart the ingest.
      val pending = ls.filter(_.getPath.getName.startsWith(TmpPrefix))
      require(pending.isEmpty,
        s"band store $bandStoreDir has an unfinished compaction " +
          s"(${pending.map(_.getPath.getName).mkString(", ")}) — " +
          "run compactBandStore to complete the swap before ingesting")
      val dirs = ls.map(_.getPath)
        .filter(d => d.getName match {
          case BatchDirRe(b) => b.toLong < beforeBatch
          case _             => false
        })
      if (dirs.isEmpty) None
      else Some(spark.read.option("basePath", bandStoreDir)
        .parquet(dirs.map(_.toString): _*))
    }
  }

  /** Candidate duplicate pairs implied by the ENTIRE accumulated band
    * store — including same-batch pairs the per-batch verdicts never
    * probed (the loop checks new-vs-seen only). One (band, bsig)
    * self-join over stored rows: the corpus is never re-shingled, so
    * this is the batch composition step — cross-batch transitive GROUP
    * labels — priced at the store, not the corpus. Compose with
    * `Dedup.verifyCandidatePairs` (exact verification confined to
    * candidate docs) and `Dedup.keepBestPerGroup` for retention.
    *
    * Unlike the ingest loop's own reads, this has NO "strictly before
    * my batch" guard to hide a torn newest partition (a drop that
    * crashed mid band-write and hasn't replayed yet), so it reads only
    * _SUCCESS-committed partitions — missing band rows would silently
    * drop candidate pairs and mislabel groups. */
  def storedCandidatePairs(spark: SparkSession, bandStoreDir: String,
                           id: String): DataFrame = {
    val p = new Path(bandStoreDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"no band store under $bandStoreDir")
    val ls = fs.listStatus(p).toSeq.filter(_.isDirectory)
    val pending = ls.filter(_.getPath.getName.startsWith(TmpPrefix))
    require(pending.isEmpty,
      s"band store $bandStoreDir has an unfinished compaction " +
        s"(${pending.map(_.getPath.getName).mkString(", ")}) — " +
        "run compactBandStore to complete the swap first")
    val committed = ls
      .filter(s => BatchDirRe.pattern.matcher(s.getPath.getName).matches() &&
        fs.exists(new Path(s"${s.getPath}/_SUCCESS")))
      .map(_.getPath)
    require(committed.nonEmpty, s"no committed band partitions under $bandStoreDir")
    Dedup.bandPairJoin(
      spark.read.option("basePath", bandStoreDir)
        .parquet(committed.map(_.toString): _*)
        .drop("ingest_batch"),
      id)
  }

  /** One turn of the ingest loop (the foreachBatch body). Writes
    * per-document dedup verdicts to `resultDir/ingest_batch=<id>` —
    * (id, first_match, n_matches, is_dup) against the seen corpus —
    * and the batch's band frame to `bandStoreDir/ingest_batch=<id>`. */
  def ingestBatch(batch: DataFrame, batchId: Long, cfg: Config,
                  bandStoreDir: String, resultDir: String): Unit = {
    val spark = batch.sparkSession
    // consumed twice (store write + probe join) — stage the one
    // shingle pass instead of running it per consumer
    val bands = Dedup.bandFrame(
        Dedup.shingleSet(batch, cfg.id, cfg.text, cfg.shingleN),
        cfg.id, cfg.numHashes, cfg.rowsPerBand)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seen = seenBands(spark, bandStoreDir, batchId)
        .map(_.drop("ingest_batch"))
        .getOrElse(bands.limit(0))
      val pairs = Dedup.incrementalLshPairsFromBands(bands, seen, cfg.id)
      val grouped = pairs.groupBy(col("new_id"))
        .agg(min(col("seen_id")).as("first_match"),
          count(lit(1)).as("n_matches"))
      // every batch doc surfaces, including shingle-free short ones
      val out = batch.select(col(cfg.id))
        .join(grouped, col(cfg.id) === col("new_id"), "left")
        .select(col(cfg.id), col("first_match"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          col("first_match").isNotNull.as("is_dup"))
      out.write.mode("overwrite").parquet(batchDir(resultDir, batchId))
      bands.select(col(cfg.id), col("band"), col("bsig"))
        .write.mode("overwrite").parquet(batchDir(bandStoreDir, batchId))
    } finally bands.unpersist(blocking = false)
  }

  /** Start the loop over a streaming source of documents. The default
    * AvailableNow trigger is the crawl-drop shape — run when a drop
    * lands, drain everything new, exit; the checkpoint carries batch
    * ids and source progress across runs.
    *
    * Trigger contract: leave the source's `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` UNSET so each AvailableNow run drains its
    * drop as ONE micro-batch. Dedup semantics stay correct either way
    * (a split drop's later batches read its earlier batches as seen
    * corpus — strictly-before still holds), but batch ids then stop
    * being drop ids, which breaks replay-overwrite granularity
    * expectations callers may have built on "one drop = one partition"
    * (and any oracle keyed on drop membership). */
  /** `compactEvery` > 0 folds the band store in-loop every that many
    * batches (after the batch's own append), so a long-running crawl
    * ingest manages its own small-file problem instead of deferring to
    * an out-of-band job. The fold covers batches strictly BELOW the
    * current id — the one partition a checkpoint replay can overwrite
    * stays out of it — and a replayed batch re-runs its compaction as a
    * no-op (fewer than two foldable partitions remain), so the hook is
    * idempotent end to end. foreachBatch bodies run sequentially: the
    * compactor never races the appender it shares the loop with
    * (the single-writer discipline compactBandStore requires).
    *
    * When the loop owns compaction it must also own RECOVERY: a crash
    * inside a previous turn's fold leaves a stage that every band-store
    * read fails fast on — including the replayed batch's own
    * `seenBands` — so each turn first completes or discards any pending
    * stage (safe: this loop is the single writer). Without that, a
    * mid-compaction crash would wedge the stream behind exactly the
    * out-of-band intervention in-loop compaction exists to remove. */
  def run(source: DataFrame, cfg: Config, bandStoreDir: String,
          resultDir: String, checkpointDir: String,
          trigger: Trigger = Trigger.AvailableNow(),
          compactEvery: Int = 0): StreamingQuery =
    source.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (compactEvery > 0)
          recoverPendingCompaction(
            new Path(bandStoreDir)
              .getFileSystem(b.sparkSession.sessionState.newHadoopConf()),
            bandStoreDir)
        ingestBatch(b, id, cfg, bandStoreDir, resultDir)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
          compactBandStore(b.sparkSession, bandStoreDir, upToBatch = id): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** All per-document verdicts written so far, with their
    * `ingest_batch` partition column. Reads only partitions whose
    * parquet _SUCCESS marker committed: a crashed batch's torn verdict
    * partition stays invisible until its checkpoint replay overwrites
    * it — the same guard the band-store read path gets from its strict
    * batch-id filter. */
  def results(spark: SparkSession, resultDir: String): DataFrame = {
    val p = new Path(resultDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"no results under $resultDir")
    val committed = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        BatchDirRe.pattern.matcher(s.getPath.getName).matches() &&
        fs.exists(new Path(s"${s.getPath}/_SUCCESS")))
      .map(_.getPath)
    require(committed.nonEmpty, s"no committed result partitions under $resultDir")
    spark.read.option("basePath", resultDir)
      .parquet(committed.map(_.toString): _*)
  }

  /** Compact the band store: fold every partition with id <
    * `upToBatch` into ONE partition dir (named for the highest folded
    * id). Over thousands of crawl drops the per-batch dirs accumulate
    * small files; dedup semantics only need "strictly before the
    * current batch", not which batch a band came from, so folding is
    * loss-free — batch N (and any replay of it, N >= upToBatch) reads
    * the compacted partition exactly as it read the originals.
    *
    * Only _SUCCESS-committed partitions below `upToBatch` are folded:
    * a torn partition (a batch that crashed mid band-write and will be
    * replayed) is excluded automatically, so its replay overwrites its
    * own dir and can never clobber folded history — which makes ANY
    * `upToBatch` safe, from the in-loop hook (current batch id: its
    * own just-written partition is excluded by the strict <) or
    * out-of-band with no knowledge of the checkpoint's commit state.
    * Returns the number of partitions folded (0 = nothing to do). */
  def compactBandStore(spark: SparkSession, bandStoreDir: String,
                       upToBatch: Long): Int = {
    val p = new Path(bandStoreDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0
    recoverPendingCompaction(fs, bandStoreDir)
    val olds = fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap(d => d.getName match {
        case BatchDirRe(b) if b.toLong < upToBatch &&
          fs.exists(new Path(s"$d/_SUCCESS")) => Some((b.toLong, d))
        case _ => None
      })
      .sortBy(_._1)
    if (olds.size < 2) return 0
    val target = olds.map(_._1).max
    val merged = spark.read
      .option("basePath", bandStoreDir)
      .parquet(olds.map(_._2.toString): _*)
      .drop("ingest_batch")
    // crash discipline (single writer): the fold is FULLY staged in a
    // dot-dir (invisible to seenBands' partition regex) before any old
    // partition is touched, and the swap is armed by a `_FOLDED`
    // coverage manifest (graft.operators.FoldManifest — the exact
    // partition ids the stage covers) written LAST. A crash before the
    // manifest lands proves no original was touched (recovery discards
    // the stage); a crash after is completed by recovery deleting
    // exactly the manifest's partitions — so a partition that was torn
    // at stage time (excluded from the fold) and recommitted by a
    // checkpoint replay between crash and recovery survives, where a
    // target-scoped `id <= target` delete would destroy it.
    val tmp = s"$bandStoreDir/$TmpPrefix$target"
    merged.write.mode("overwrite").parquet(tmp)
    graft.operators.FoldManifest.write(fs, new Path(tmp), olds.map(_._1))
    olds.foreach { case (_, d) =>
      require(fs.delete(d, true), s"compaction failed to delete $d")
    }
    require(fs.rename(new Path(tmp), new Path(batchDir(bandStoreDir, target))),
      s"compaction failed to swap $tmp into place — history is staged " +
        "there; re-run compactBandStore to complete the swap")
    olds.size
  }

  private val TmpPrefix = ".compact_tmp_"

  /** Finish or discard a compaction interrupted mid-flight, by the
    * `_FOLDED` manifest discipline (graft.operators.FoldManifest, the
    * same protocol AnnIndex.recoverPendingCompaction runs): a stage
    * carrying BOTH its parquet _SUCCESS and a well-formed manifest is a
    * complete fold whose swap may have started — delete EXACTLY the
    * manifest's partitions and rename the stage in. Deleting by
    * manifest rather than by `id <= target` keeps a partition that was
    * uncommitted at stage time and recommitted by a checkpoint replay
    * between the crash and this recovery.
    *
    * A stage with NO parquet _SUCCESS proves the crash happened while
    * staging — under both this protocol and the pre-manifest one,
    * deletes only ever started after the stage's parquet committed —
    * so discarding it is always safe. A stage WITH _SUCCESS but
    * without a readable manifest is AMBIGUOUS: a crash in the narrow
    * window before the manifest armed the swap (discard would be
    * safe), or a pre-manifest-protocol crash after its deletes (the
    * stage is the only copy of the folded history — discard would
    * destroy it silently). A single-artifact store has no cross-check
    * to tell these apart (AnnIndex disambiguates via its second
    * artifact), so recovery FAILS FAST with the resolution choices
    * rather than guessing destructively. */
  private def recoverPendingCompaction(fs: org.apache.hadoop.fs.FileSystem,
                                       bandStoreDir: String): Unit =
    if (!fs.exists(new Path(bandStoreDir))) () // first-ever batch: nothing to heal
    else fs.listStatus(new Path(bandStoreDir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(TmpPrefix))
      .foreach { s =>
        val target = s.getPath.getName.stripPrefix(TmpPrefix).toLong
        val committed = fs.exists(new Path(s"${s.getPath}/_SUCCESS"))
        val covered =
          if (committed) graft.operators.FoldManifest.read(fs, s.getPath)
          else None
        covered match {
          case Some(ids) =>
            fs.listStatus(new Path(bandStoreDir)).toSeq
              .filter(_.isDirectory)
              .foreach(d => d.getPath.getName match {
                case BatchDirRe(b) if ids(b.toLong) =>
                  require(fs.delete(d.getPath, true),
                    s"compaction recovery failed to delete ${d.getPath}")
                case _ => ()
              })
            require(fs.rename(s.getPath, new Path(batchDir(bandStoreDir, target))),
              s"compaction recovery failed to swap ${s.getPath} into place")
          case None if committed =>
            throw new IllegalStateException(
              s"compaction stage ${s.getPath} is parquet-committed but has no " +
                "readable _FOLDED coverage manifest — cannot tell a pre-arm crash " +
                "(safe to discard) from a pre-manifest-protocol crash whose deletes " +
                "already ran (the stage may be the only copy of the folded history). " +
                "Resolve manually: if every original partition the fold covered is " +
                "still present, delete the stage dir to discard it; otherwise " +
                "complete the swap by hand (remove the covered partitions, rename " +
                s"the stage to ${batchDir(bandStoreDir, target)})")
          case None => require(fs.delete(s.getPath, true),
            s"failed to discard torn compaction stage ${s.getPath}")
        }
      }
}
