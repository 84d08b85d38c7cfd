package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — binary column, partition-parallel
  * decode, typed output schema — while the codec itself is a
  * deterministic STUB (this environment ships no image/audio libraries).
  * Swapping `stubDecode` for an actual JNI/library call changes nothing
  * in the plan: mapPartitions keeps the decoder amortized per batch, and
  * the binary payload never passes through a shuffle (decode before
  * aggregation, project metadata only).
  */
object Multimodal {

  /** Typed decode output — what a real image decoder would yield. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, frames: Int)

  /** Treat text as the opaque media payload (binary). In production this
    * column arrives as real bytes (image/audio) from parquet/object store. */
  def asBinary(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(col(id).cast("long").as("doc_id"),
      encode(col(payload), "UTF-8").as("content"))

  /** Deterministic fake decode: metadata derived purely from the bytes,
    * so tests/oracles can verify the plumbing end-to-end. A real decoder
    * (???) would parse headers here. */
  private[operators] def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    MediaMeta(id, n, fmt, width = 16 + (n % 64), height = 16 + (n % 48),
      frames = 1 + (n % 4))
  }

  /** Partition-parallel decode: one iterator pass per partition, typed
    * output. This is the Scala analog of mapInPandas batch decode. */
  def decodeMeta(spark: SparkSession, bin: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
  }

  /** Deterministic frame sampling: pick every k-th frame index — shape of
    * a video frame-sampler, emitting (doc_id, frame_idx) rows. */
  def sampleFrames(spark: SparkSession, meta: Dataset[MediaMeta], everyK: Int): DataFrame = {
    import spark.implicits._
    meta.flatMap(m => (0 until m.frames by everyK).map(f => (m.doc_id, f)))
      .toDF("doc_id", "frame_idx")
  }

  /** Resize stub: aspect-preserving fit into a bounding box — the pure
    * geometry a real resampler shares; only the pixel pass is faked. */
  def resizeMeta(spark: SparkSession, meta: Dataset[MediaMeta],
                 maxW: Int, maxH: Int): Dataset[MediaMeta] = {
    import spark.implicits._
    meta.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }
  }

  // ------------------------------------------------------------------
  // Pointer-column blob store: the 100 TB layout for media. In-row
  // binary (above) is right for small payloads that live and die with
  // the row; real image/audio/video columns belong in a CONTENT-
  // ADDRESSED store with the relational row carrying only a pointer —
  // dedup falls out of the addressing (two docs sharing bytes store
  // them once), the relational tables stay scan-fast (no multi-MB
  // values riding every shuffle), and a blob is fetchable without
  // scanning the store (the same `_filebloom` point-lookup sidecar the
  // Layout machinery already maintains). Identity is sha-256 of the
  // bytes; the Bloom probe key is xxhash64 of the same bytes (64-bit,
  // superset-safe — the join back verifies the sha exactly).
  // ------------------------------------------------------------------

  /** Materialize the content-addressed store for `bin` (a
    * (doc_id, content binary) frame) at `path` and return the POINTER
    * frame (doc_id, blob_sha, blob_key, n_bytes) — what the relational
    * table keeps in place of the bytes. The store holds one row per
    * DISTINCT content, spread over `nFiles` files by probe key, with a
    * `_filebloom` sidecar so point fetches touch ~1 file. Scale shape:
    * one dropDuplicates shuffle over (sha-keyed) blobs + one
    * repartition write; the pointer frame is a projection, never
    * shuffled. Callers persist pointers next to their table — the
    * returned frame recomputes hashes if re-evaluated. */
  def writeBlobStore(spark: SparkSession, bin: DataFrame, path: String,
                     nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val addressed = bin.select(col("doc_id"),
      sha2(col("content"), 256).as("blob_sha"),
      xxhash64(col("content")).as("blob_key"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      col("content"))
    StoreLease.withLease(spark, path, "writeBlobStore") { lease =>
      StoreLease.verify(spark, lease)
      addressed.select(col("blob_sha"), col("blob_key"), col("n_bytes"), col("content"))
        .dropDuplicates("blob_sha")
        .repartition(nFiles, col("blob_key"))
        .write.mode("overwrite").parquet(path)
      Layout.writeBloomSidecar(spark, path, "blob_key")
    }
    addressed.drop("content")
  }

  /** Append NEW corpus content to an existing blob store: only payloads
    * whose sha the store doesn't already hold are written — content
    * addressing makes cross-ingest dedup one anti-join against the
    * store's column-pruned sha scan — and the point-fetch sidecar is
    * rebuilt to cover the grown file set (the drift gate demands
    * sidecar == listing). Returns the pointer frame for ALL of `bin`
    * (pointers resolve whether the payload was already present or just
    * written). Content-level idempotent: re-running the same append
    * finds every sha present and writes nothing. Job-level atomicity
    * comes from the parquet commit protocol (tasks stage under
    * `_temporary`, invisible to readers and to the sidecar listing);
    * single writer, like every store maintainer here. */
  def appendBlobStore(spark: SparkSession, bin: DataFrame, path: String,
                      nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val addressed = bin.select(col("doc_id"),
      sha2(col("content"), 256).as("blob_sha"),
      xxhash64(col("content")).as("blob_key"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      col("content"))
    // single-writer contract is ENFORCED, not convention: a concurrent
    // maintainer (another append, a vacuum) fails at acquire
    StoreLease.withLease(spark, path, "appendBlobStore") { lease =>
      val existing = spark.read.parquet(path).select(col("blob_sha"))
      val fresh = addressed
        .select(col("blob_sha"), col("blob_key"), col("n_bytes"), col("content"))
        .dropDuplicates("blob_sha")
        .join(existing, Seq("blob_sha"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // nothing-new appends (replays, all-dup drops) must write NOTHING:
        // a whole-empty parquet write still emits one schema-preserving
        // empty part file, which the sidecar's exact-coverage gate would
        // then flag on every later pruned read (empty files contribute no
        // sidecar rows) — and the store/sidecar are already correct anyway
        if (!fresh.isEmpty) {
          StoreLease.verify(spark, lease)
          fresh.repartition(nFiles, col("blob_key"))
            .write.mode("append").parquet(path)
          Layout.writeBloomSidecar(spark, path, "blob_key")
        }
      } finally { fresh.unpersist(); () }
    }
    addressed.drop("content")
  }

  private def vacuumTmp(path: String) = s"$path.vacuum_tmp"
  private def vacuumTrash(path: String) = s"$path.vacuum_trash"

  /** Drop every blob no LIVE pointer references — the erasure pass for
    * media (content addressing stores bytes once, so a blob dies only
    * when its LAST referencing row is gone). Rewrites the store to
    * `nFiles` files holding exactly the live shas, rebuilds the
    * sidecar, and returns (kept, dropped). The replace is the classic
    * two-rename swap — stage the survivors beside the store, rename
    * the store to a trash dir (directory rename: atomic on local/HDFS),
    * rename the stage in, delete the trash — so no crash point loses
    * bytes: `recoverVacuum` (run on entry here and available to ops)
    * completes or discards any interrupted swap from the directory
    * states alone. Single writer, like compaction everywhere else. */
  def vacuumBlobStore(spark: SparkSession, path: String,
                      livePointers: DataFrame, nFiles: Int): (Long, Long) =
    // the lease is what makes "single writer" enforced: two concurrent
    // vacuums would otherwise each pass their own crash recovery and
    // silently lose bytes in the rename crossfire; the second now fails
    // at acquire, and a stalled first fails at verify before its swap
    StoreLease.withLease(spark, path, "vacuumBlobStore") { lease =>
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    recoverVacuum(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val store = spark.read.parquet(path)
    val live = store.join(
      livePointers.select(col("blob_sha")).distinct(), Seq("blob_sha"), "left_semi")
    val total = store.count()
    // Full erasure must not go through the rewrite path: a whole-empty
    // parquet overwrite still emits one schema-preserving empty part
    // file, which the sidecar's exact-coverage gate can never cover
    // (empty files contribute no sidecar rows — the same hazard
    // appendBlobStore guards) and no later bloom-refresh could repair.
    // Refuse loudly; erasing a whole store is a directory delete the
    // operator should perform deliberately, not a vacuum side effect.
    require(!live.isEmpty,
      s"vacuumBlobStore: no live pointer references any of the $total blobs " +
        s"at $path — a vacuum to empty would leave an unservable store. " +
        "If full erasure is intended, delete the store directory (and its " +
        "sidecar) explicitly instead")
    live.repartition(nFiles, col("blob_key"))
      .write.mode("overwrite").parquet(vacuumTmp(path))
    val kept = spark.read.parquet(vacuumTmp(path)).count()
    val (p, tmp, trash) = (new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(vacuumTmp(path)),
      new org.apache.hadoop.fs.Path(vacuumTrash(path)))
    // verify-on-commit: the staging write above is invisible to readers;
    // the FIRST rename is the point of no return, so the lease must
    // still be ours here (a takeover means we stalled past the TTL and
    // someone else is maintaining this store NOW)
    StoreLease.verify(spark, lease)
    require(fs.rename(p, trash),
      s"vacuum failed to move $path aside — store is intact; retry")
    require(fs.rename(tmp, p),
      s"vacuum failed to swap $tmp into place — the survivors are staged " +
        s"there and the originals are in ${vacuumTrash(path)}; re-run " +
        "vacuumBlobStore (or recoverVacuum) to complete the swap")
    require(fs.delete(trash, true), s"vacuum failed to clear ${vacuumTrash(path)}")
    Layout.writeBloomSidecar(spark, path, "blob_key")
    (kept, total - kept)
    }

  /** Complete or discard an interrupted vacuum swap, from directory
    * states alone (no manifest needed — the two-rename protocol makes
    * every crash point distinguishable):
    *  - store present → any stage/trash is stale; discard both
    *    (originals were never touched: the store rename is the FIRST
    *    mutation and it removes the store dir whole);
    *  - store absent, stage committed (_SUCCESS) → the crash fell
    *    between the two renames; rename the stage in, drop the trash;
    *  - store absent, no committed stage, trash present → the stage
    *    was lost before its commit; restore the trash (nothing was
    *    dropped yet). */
  def recoverVacuum(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val (p, tmp, trash) = (new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(vacuumTmp(path)),
      new org.apache.hadoop.fs.Path(vacuumTrash(path)))
    val tmpCommitted = fs.exists(new org.apache.hadoop.fs.Path(s"${vacuumTmp(path)}/_SUCCESS"))
    if (fs.exists(p)) {
      if (fs.exists(tmp)) require(fs.delete(tmp, true), s"failed to discard stale $tmp")
      if (fs.exists(trash)) require(fs.delete(trash, true), s"failed to clear stale $trash")
      // A swap that completed its renames but crashed before the sidecar
      // write leaves the swapped-in store WITHOUT `_filebloom` (the old
      // sidecar rode the store dir into the trash) — whether or not the
      // trash delete also ran. Recovery must finish the interrupted
      // vacuum's last step, not just tidy directories, or every later
      // point fetch fails on the missing sidecar.
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/${Layout.bloomSidecarDir}")))
        Layout.writeBloomSidecar(spark, path, "blob_key")
    } else if (tmpCommitted) {
      require(fs.rename(tmp, p), s"vacuum recovery failed to swap $tmp into place")
      if (fs.exists(trash)) require(fs.delete(trash, true), s"failed to clear $trash")
      Layout.writeBloomSidecar(spark, path, "blob_key")
    } else if (fs.exists(trash)) {
      if (fs.exists(tmp)) require(fs.delete(tmp, true), s"failed to discard torn $tmp")
      require(fs.rename(trash, p), s"vacuum recovery failed to restore $trash")
    }
  }

  /** Resolve a pointer frame back to its bytes through the store. A
    * DANGLING pointer — the blob deleted, the store truncated, a sha
    * the store never held — fails the job with the sha named the
    * moment `content` is read, never a silent row drop (an inner join
    * would shrink the corpus without a trace; at 100 TB that's
    * unnoticed data loss). The left join preserves cardinality even
    * for consumers that never touch the bytes (Catalyst prunes the
    * unread guard, which is safe exactly because no row was dropped).
    * Plain shuffle join on the sha: the store side is big by design,
    * so no broadcast. */
  def joinBlobs(spark: SparkSession, path: String, pointers: DataFrame): DataFrame = {
    Packing.requireAbsent(pointers, "joinBlobs(pointers)", "content", "_s_sha")
    val store = spark.read.parquet(path)
      .select(col("blob_sha").as("_s_sha"), col("content"))
    pointers.join(store, col("blob_sha") === col("_s_sha"), "left")
      .withColumn("content",
        when(col("_s_sha").isNull, raise_error(
          concat(lit("blob store at "), lit(path),
            lit(" is missing sha "), col("blob_sha"))))
          .otherwise(col("content")))
      .drop("_s_sha")
  }

  /** Point-fetch blobs by probe key through the Bloom sidecar — the
    * serving path ("show me these 50 images"): reads only the files
    * whose filter admits a key, exact-verified on the key after read.
    * Returns the pruned scan so callers can assert pruning happened. */
  def fetchBlobs(spark: SparkSession, path: String,
                 keys: Seq[Long]): Layout.PrunedScan = {
    val scan = Layout.bloomPrunedRead(spark, path, keys)
    scan.copy(df = scan.df.filter(col("blob_key").isin(keys: _*)))
  }

  // ------------------------------------------------------------------
  // Perceptual (content-level) near-dup: the duplicate class byte-
  // shingle LSH cannot see by construction. A re-encoded image (same
  // picture, different quality/format) shares ~no byte n-grams with
  // its original, so content identity needs a fingerprint of the
  // DECODED raster, not of the encoding. aHash/dHash (the classic
  // average/gradient hashes) over a deterministic, decode-free raster:
  // the payload's byte stream stands in for the pixel stream (the
  // stubDecode pattern above — a real decoder swaps in per format
  // without touching the plan), downscaled by block-averaging into 64
  // cells, each cell thresholded against the global mean (aHash) or
  // its cyclic successor (dHash). All-integer arithmetic — mean
  // comparisons are cross-multiplied, never divided — so a DuckDB
  // oracle replays the chain bit-for-bit. Reference capability
  // generalized: content-level identity beyond exact bytes,
  // /root/reference/pspf/connectors/base.py:48-70.
  // ------------------------------------------------------------------

  /** Per-payload block sums: the byte stream split at boundaries
    * floor(b·len/nBlocks), b = 0..nBlocks — the downscale grid a real
    * thumbnailer uses — each block summed in ONE projection: no
    * shuffle, no UDF, O(len) per row. Each element slices bytes
    * straight off the BINARY column (never off a projected
    * whole-payload hex alias — the CollapseProject/HOF O(len²) trap
    * `Dedup.byteShingleSet` documents). Payloads shorter than nBlocks
    * leave empty cells (sum 0, length 0), handled downstream.
    *
    * Bytes are read SEVEN AT A TIME: one substr+hex+conv renders a
    * ≤7-byte chunk as one long < 2^56 (7 is the widest chunk whose
    * unsigned hex value always survives conv's string→long cast), and
    * the byte sum falls out as the base-256 digit sum — seven shifts
    * and masks on that long, plain JVM arithmetic. Versus the previous
    * byte-at-a-time form this cuts the expensive per-element string
    * ops (binary slice, hex string, conv parse) 7×, which halved the
    * perceptual family's hash stage at sf0.1 (measured: the l116 hash
    * map job 10.9 → 4.7 s); value-identical by construction (digit
    * sums of disjoint chunks = byte sum of the block), pinned against
    * the byte-at-a-time reference in MultimodalSpec. */
  def blockSums(payload: Column, nBlocks: Int): Column = {
    require(nBlocks >= 1, s"nBlocks must be >= 1, got $nBlocks")
    val chunk = 7
    val nb = octet_length(payload).cast("long")
    transform(sequence(lit(0), lit(nBlocks - 1)), b => {
      // boundary math in LONG (b·len would clip int for ~32 MB
      // payloads), sequence/substr positions back in INT (what the
      // expressions type-check at; payloads are int-addressed anyway)
      val lo = floor(b.cast("long") * nb / nBlocks).cast("int")
      val hi = floor((b.cast("long") + 1) * nb / nBlocks).cast("int")
      val len = hi - lo
      // chunk VALUES materialize through an inner transform so each
      // conv runs once and the digit-sum shifts read a bound lambda
      // VARIABLE — referencing a Column val n times would clone the
      // conv subtree n times, and HOF lambdas evaluate interpreted
      // (no codegen CSE), so the first cut of this change re-parsed
      // every chunk 7× and LOST to the byte-at-a-time form
      when(hi > lo,
        aggregate(
          transform(sequence(lit(0), floor((len - 1) / chunk).cast("int")),
            j => conv(hex(payload.substr(lo + j * chunk + 1,
              least(lit(chunk), len - j * chunk))), 16, 10).cast("long")),
          lit(0L), (acc, v) =>
            // digit sum of the bound chunk value: a short final chunk's
            // missing high digits read 0
            acc + (0 until chunk)
              .map(t => shiftright(v, 8 * t).bitwiseAND(lit(255L)))
              .reduce(_ + _)))
        .otherwise(lit(0L))
    })
  }

  /** 64-bit aHash + dHash per payload: (id, ahash, dhash), LongType.
    * aHash bit b (weight 2^b; bit 63's weight is Long.MinValue —
    * two's-complement packing, the same literal the oracle sums) is
    * set iff cell b's mean byte exceeds the payload's global mean,
    * compared exactly as sum_b·len > total·len_b. dHash bit b is set
    * iff cell b's mean exceeds its cyclic successor's —
    * sum_b·len_{b+1} > sum_{b+1}·len_b (the gradient form; cyclic so
    * bit 63 carries signal like every other). Equal-length cells
    * (len % 64 == 0) reduce both to plain sum comparisons, but the
    * cross-multiplied form stays exact at ANY length; products stay
    * under 2^63 for payloads to ~1 GB. Empty cells threshold false on
    * both sides (0 > 0 fails), deterministically.
    *
    * Robustness contract (what "perceptual" buys): any byte-level
    * perturbation that preserves every cell sum — a re-quantization,
    * dither, or pair-local reorder, the stand-ins for a quality/format
    * re-encode — yields the IDENTICAL hash while destroying every byte
    * n-gram; an actual content change moves cell means and flips bits
    * roughly in proportion. One projection end to end, no shuffle. */
  def perceptualHashes(bin: DataFrame, id: String, payload: String): DataFrame = {
    val nBlocks = 64
    val base = bin.select(col(id),
      octet_length(col(payload)).cast("long").as("_nb"),
      blockSums(col(payload), nBlocks).as("_bs"))
      .withColumn("_tot", aggregate(col("_bs"), lit(0L), _ + _))
    def sumB(b: Int) = element_at(col("_bs"), b + 1)
    def lenB(b: Int) =
      (floor(lit((b + 1).toLong) * col("_nb") / nBlocks) -
        floor(lit(b.toLong) * col("_nb") / nBlocks)).cast("long")
    val abits = (0 until nBlocks).map { b =>
      when(sumB(b) * col("_nb") > col("_tot") * lenB(b), lit(1L << b))
        .otherwise(lit(0L))
    }
    val dbits = (0 until nBlocks).map { b =>
      val c = (b + 1) % nBlocks
      when(sumB(b) * lenB(c) > sumB(c) * lenB(b), lit(1L << b))
        .otherwise(lit(0L))
    }
    // distinct powers of two sum without carries — addition IS bitwise
    // assembly here, Long.MinValue included (two's-complement wrap)
    base.select(col(id), abits.reduce(_ + _).as("ahash"),
      dbits.reduce(_ + _).as("dhash"))
  }

  /** Perceptual near-dup pairs within `maxHamming` bit flips of the
    * 64-bit dHash, via 16-bit-band LSH: 4 bands of 16 bits, pigeonhole
    * full recall for maxHamming <= 3 (3 flips dirty at most 3 of the 4
    * bands — the `Dedup.simhashPairs` guarantee at 64 bits). Same
    * equi-join-on-(band, value) shape — candidates only from shared
    * buckets, never a quadratic scan — then exact-filtered on popcount
    * of the XOR. The aHash Hamming distance rides along per surviving
    * pair (re-encode verdicts conventionally want BOTH hashes close;
    * callers filter on it). Sign-extending shiftright is harmless
    * under the 16-bit mask. Output (da, db, hamming, hamming_a),
    * da < db. */
  def perceptualNearDupPairs(bin: DataFrame, id: String, payload: String,
                             maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"16-bit-band LSH over 4 bands guarantees full recall only for " +
        s"maxHamming <= 3, got $maxHamming")
    val ph = perceptualHashes(bin, id, payload)
    val withBands = ph.select(col(id), col("ahash"), col("dhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("bno"),
        shiftright(col("dhash"), 16 * b).bitwiseAND(lit(65535L)).as("bval"))): _*)).as("bd"))
      .select(col(id), col("ahash"), col("dhash"),
        col("bd.bno").as("bno"), col("bd.bval").as("bval"))
    withBands.as("x").join(withBands.as("y"),
        col("x.bno") === col("y.bno") && col("x.bval") === col("y.bval") &&
          col(s"x.$id") < col(s"y.$id"))
      .select(col(s"x.$id").as("da"), col(s"y.$id").as("db"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))).cast("long").as("hamming"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).cast("long").as("hamming_a"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Feature-extraction stub: a real model would run per batch here
    * (that's why this is mapPartitions — weights load once per
    * partition, not per row); the fake embeds byte statistics into a
    * fixed-dim vector, deterministically. */
  def extractFeatures(spark: SparkSession, bin: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    bin.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model load" would happen here
        it.map { case (id, bytes) =>
          val v = Array.tabulate(dim) { d =>
            if (bytes.isEmpty) 0f
            else {
              var s = 0
              var i = d
              while (i < bytes.length) { s += bytes(i) & 0xff; i += dim }
              (s % 1000) / 1000.0f
            }
          }
          (id, v)
        }
      }.toDF("doc_id", "features")
  }
}
