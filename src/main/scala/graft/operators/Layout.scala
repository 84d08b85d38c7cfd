package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning — the write-side half of
  * "fast at 100 TB". Parquet keeps min/max stats per row group and
  * Spark prunes files/row-groups on them, but the stats only cut work
  * when co-occurring values are physically co-located. A linear sort
  * clusters ONE column; Z-ORDERING interleaves the bits of several
  * columns so every participating column's ranges stay narrow per file
  * — multi-dimensional predicates (user AND time, lang AND source)
  * skip most of the corpus at scan time.
  *
  * Plan shape: one bounded min/max aggregate per call (a single
  * collected row), then a pure-projection z-value, then ONE range
  * shuffle (`repartitionByRange` + intra-partition sort). No global
  * sort, no driver data path — the same layout pass at any scale.
  */
object Layout {

  /** Uniform bucket of `c` into [0, 2^bits) given (lo, hi) — constant
    * columns (hi == lo) collapse to bucket 0. */
  private def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1L << bits
    if (hi == lo) lit(0L)
    else least(lit(n - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble)).cast("long")))
  }

  /** The z-value column: bit j of column c lands at position
    * j * nCols + (nCols - 1 - c), so significance alternates across
    * columns (the Morton interleave). Pure bit arithmetic — codegen'd,
    * no UDF. Public for specs and callers that already hold bucket
    * columns. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    val terms = for {
      (b, c) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + (n - 1 - c))
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Rewrite `df` into `numPartitions` z-ordered output partitions over
    * `cols` (numeric/temporal). Each output partition (→ parquet file)
    * then carries narrow min/max ranges on EVERY clustering column, so
    * multi-dimensional scan predicates prune files instead of reading
    * them. bitsPerCol defaults to the max that keeps the z-value in a
    * signed 64-bit long. */
  def zorderBy(df: DataFrame, cols: Seq[String], numPartitions: Int,
               bitsPerCol: Int = 0): DataFrame = {
    require(cols.nonEmpty, "zorderBy requires at least one column")
    require(cols.size <= 8, s"z-ordering ${cols.size} columns dilutes every dimension past use")
    val bits = if (bitsPerCol > 0) bitsPerCol else math.min(16, 62 / cols.size)
    require(bits * cols.size <= 62, s"bitsPerCol=$bits over ${cols.size} cols overflows a long")
    // one bounded aggregate: 2 doubles per clustering column
    val agg = df.agg(
      min(col(cols.head).cast("double")).as("lo0"),
      cols.zipWithIndex.tail.map { case (c, i) => min(col(c).cast("double")).as(s"lo$i") } ++
        cols.zipWithIndex.map { case (c, i) => max(col(c).cast("double")).as(s"hi$i") }: _*)
      .head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // null extents = empty input, an all-null column, or a column
      // whose cast("double") is null (e.g. free-form strings) — fail
      // with the offending column named instead of a bare NPE
      require(!agg.isNullAt(i) && !agg.isNullAt(cols.size + i),
        s"zorderBy: column '$c' has no numeric min/max extent " +
          "(empty input, all-null, or not castable to double)")
      val lo = agg.getDouble(i)
      val hi = agg.getDouble(cols.size + i)
      bucketize(col(c), lo, hi, bits)
    }
    df.withColumn("_zval", interleave(buckets, bits))
      .repartitionByRange(numPartitions, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")
  }

  /** Per-partition min/max extents of `cols` — the pruning-efficiency
    * probe a layout job logs after writing (narrow extents = effective
    * stats). Exposed for specs and ops. */
  def partitionExtents(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exts = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.withColumn("_pid", spark_partition_id())
      .groupBy(col("_pid"))
      .agg(exts.head, exts.tail: _*)
  }

  // ------------------------------------------------------------------
  // File-level data skipping: the read-side half of the layout story.
  // Parquet's own min/max stats prune ROW GROUPS only after the reader
  // has already opened the file; at 100 TB the win that matters is not
  // opening (or listing into the task set) the file at all. Delta/
  // Iceberg solve this with a stats manifest consulted at planning
  // time; the same idea here as a `_filestats` parquet sidecar (the
  // leading underscore keeps it invisible to plain Spark/Hadoop reads,
  // same convention as `_SUCCESS`). Sidecar size is O(files), i.e.
  // ~KBs per TB of data — always broadcast-small.
  // ------------------------------------------------------------------

  private val StatsDir = "_filestats"

  /** Basename of a file path/URI column — sidecars store file
    * references RELATIVE to the store root (the Delta/Iceberg
    * convention), so a moved or copied store resolves against the
    * read-time path instead of a dead (or worse, stale-but-alive)
    * absolute URI captured at write time. Data files sit directly
    * under the root (plain parquet write), so the basename IS the
    * relative path. Absolute URIs from pre-relative sidecars
    * normalize through the same extraction, keeping old stores
    * readable — the listing check below still verifies they belong
    * to THIS root. */
  private def fileName(c: Column): Column = regexp_extract(c, "[^/]+$", 0)

  /** Planning-time listing of the parquet data files directly under
    * `path` (underscore/dot names are metadata, not data). O(files),
    * the same cost class as reading the sidecar itself.
    *
    * The sidecar format keys files by BASENAME, which is only a valid
    * identity in a FLAT store (plain `df.write.parquet` — the layout
    * `writeClustered`/`refreshStats` produce). A partitioned/nested
    * store would put data files in subdirectories the flat listing
    * never sees while `input_file_name()`-derived sidecar entries DO
    * see them — every pruned read would then fail with a misleading
    * "deleted/moved?" drift message that `ctl stats-refresh` can never
    * heal. So the flat-layout contract is validated here, where both
    * build and probe paths pass, and a nested store fails with the
    * actual cause named. */
  private def listDataFiles(spark: org.apache.spark.sql.SparkSession,
                            path: String): Set[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(hPath)
    val nestedDirs = entries.iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .toSeq.sorted
    require(nestedDirs.isEmpty,
      s"Layout sidecars require a FLAT parquet store (files keyed by basename), " +
        s"but '$path' contains data subdirectories: ${nestedDirs.mkString(", ")}. " +
        "Partitioned/nested layouts are not supported by _filestats/_filebloom — " +
        "rewrite the store flat (e.g. Layout.writeClustered) before pruned reads.")
    entries.iterator
      .filter(_.isFile)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .toSet
  }

  /** A pruned scan is a SUPERSET guarantee over the store's data — a
    * guarantee the sidecar can only honor if it covers every data file
    * actually present. Any file added after the sidecar was written
    * (append, compaction, out-of-band write) would otherwise be
    * silently excluded from every pruned scan: silent data loss, the
    * exact failure class the rest of the engine fails loudly on. So at
    * plan time the sidecar's file set must EQUAL the store's listing —
    * drift in either direction aborts the scan with the offending
    * files named. */
  private def requireSidecarCovers(actual: Set[String],
                                   sidecar: Seq[String],
                                   sidecarDir: String, path: String): Unit = {
    val inSidecar = sidecar.toSet
    val uncovered = actual -- inSidecar
    val stale = inSidecar -- actual
    require(uncovered.isEmpty && stale.isEmpty,
      s"$sidecarDir sidecar at '$path' does not match the store's data files — " +
        (if (uncovered.nonEmpty)
          s"files NOT covered by the sidecar (written after it?): ${uncovered.toSeq.sorted.mkString(", ")}. "
        else "") +
        (if (stale.nonEmpty)
          s"sidecar entries with no data file (deleted/moved?): ${stale.toSeq.sorted.mkString(", ")}. "
        else "") +
        "Rebuild the sidecar before pruned reads: `ctl stats-refresh <dir> <cols>` / " +
        "`ctl bloom-refresh <dir> <keyCol>` (Layout.refreshStats / writeBloomSidecar).")
  }

  /** Z-order `df` over `cols`, write it to `path`, and commit a
    * per-file min/max stats sidecar for those columns. The sidecar scan
    * is one extra read of the fresh files (file-grouped min/max — at
    * write scale this is the cheapest moment the stats will ever be
    * computable); sidecar rows are one per data file. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     numPartitions: Int): Unit = {
    zorderBy(df, cols, numPartitions).write.mode("overwrite").parquet(path)
    refreshStats(df.sparkSession, path, cols)
  }

  /** (Re)compute the `_filestats` sidecar from the data files CURRENTLY
    * at `path` — the write-time half of `writeClustered`, exposed
    * standalone as the recovery verb the sidecar-drift fail-fast points
    * to (`ctl stats-refresh`): after any out-of-band append/compaction,
    * one scan of the store re-covers every file without rewriting data.
    * Stats keep each column's NATIVE type: casting int64 extents to
    * double rounds above 2^53 (hash-derived / snowflake ids). With a
    * Double-typed range the rounded compare happens to stay a superset
    * (round-to-nearest is monotone, so min <= hi survives rounding),
    * but that's a proof obligation every reader re-derives; native
    * stats + prunedRead's exact long-space compare make the superset
    * guarantee structural, and keep the sidecar faithful for ops
    * tooling that reads it directly. */
  def refreshStats(spark: org.apache.spark.sql.SparkSession,
                   path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "refreshStats requires at least one stats column")
    listDataFiles(spark, path) // validates the flat-store contract at build time
    val exts = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(fileName(input_file_name()).as("file"))
      .agg(exts.head, exts.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** Closed numeric range predicate `column BETWEEN lo AND hi` for the
    * skipping planner. */
  final case class ColRange(column: String, lo: Double, hi: Double)

  /** A pruned scan: `df` reads ONLY the files whose stats intersect
    * every range (callers still apply the exact predicate — skipping is
    * a superset guarantee, not a filter). `filesTotal`/`filesRead`
    * expose the pruning ratio so callers can ASSERT the layout works
    * instead of trusting it. */
  final case class PrunedScan(df: DataFrame, filesTotal: Int, filesRead: Int)

  // ------------------------------------------------------------------
  // Per-file Bloom sidecar: min/max stats prune RANGE predicates; the
  // needle-in-haystack read at 100 TB is the POINT lookup ("fetch these
  // 50 doc_ids for inspection/serving"), where min/max over a clustered
  // key keeps only ~1 file but over an unclustered or re-used key keeps
  // everything. A fixed-size Bloom filter per file answers "could this
  // file contain key k" in O(1) from the planning-time sidecar,
  // independent of file row count. Default 4096 bits × 3 probes ≈ 0.5%
  // false positives at ~250 distinct keys/file; size `bits` ≈ 16× the
  // expected keys-per-file to hold that rate (Parquet's own column
  // blooms make the same trade — at 100 TB a few hundred KB of sidecar
  // per multi-GB file). False positives only cost an extra file read —
  // the residual filter keeps results exact (the same superset
  // guarantee as `prunedRead`).
  // ------------------------------------------------------------------

  private val BloomDir = "_filebloom"
  private val BloomProbes = 3

  /** The sidecar directory name, for maintainers that need to TEST for
    * sidecar presence (e.g. vacuum crash recovery) without hardcoding
    * the layout contract. */
  def bloomSidecarDir: String = BloomDir

  /** The probe positions of a key — xxhash64 under `BloomProbes` seeds,
    * the engine's codegen'd 64-bit hash (sign-safe via pmod). Build and
    * probe MUST agree on this function AND the bit width; the probe
    * side derives the width from the sidecar schema (slots × 64), so a
    * store written at one size can never be probed at another. */
  private def probePositions(k: Column, bits: Int): Seq[Column] =
    (1 to BloomProbes).map(seed => pmod(xxhash64(lit(seed), k), lit(bits.toLong)))

  /** Write a per-file Bloom sidecar over `keyCol` for the parquet data
    * at `path`: one row per data file, `BloomSlots` bit_or-aggregated
    * longs. One extra scan of the fresh files at write time (the same
    * moment `writeClustered` prices its stats pass), all codegen'd
    * built-ins — per-row work is two hashes + two shifted bits. */
  def writeBloomSidecar(spark: org.apache.spark.sql.SparkSession,
                        path: String, keyCol: String,
                        bits: Int = 4096): Unit = {
    require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")
    listDataFiles(spark, path) // validates the flat-store contract at build time
    val slots = bits / 64
    // hash as LONG regardless of the column's physical integral width:
    // Spark's xxhash64 hashes int and long DIFFERENTLY for the same
    // value, and the probe side hashes Long literals
    val pos = probePositions(col(keyCol).cast("long"), bits)
    val withPos = spark.read.parquet(path)
      .select(fileName(input_file_name()).as("file") +:
        pos.zipWithIndex.map { case (p, i) => p.as(s"_p$i") }: _*)
    // per-row contribution to slot j: the probe's bit if the probe
    // lands in that slot (shift amount is a column, so expr() — the
    // Scala shiftleft only takes literal shifts)
    val slotCols = (0 until slots).map { j =>
      pos.indices.map(i =>
        expr(s"if(cast(_p$i / 64 as int) = $j, " +
          s"shiftleft(1L, cast(_p$i % 64 as int)), 0L)"))
        .reduce((a, b) => a.bitwiseOR(b)).as(s"_c$j")
    }
    withPos.select(col("file") +: slotCols: _*)
      .groupBy(col("file"))
      .agg(expr("bit_or(_c0)").as("b0"),
        (1 until slots).map(j => expr(s"bit_or(_c$j)").as(s"b$j")): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$BloomDir")
  }

  /** Plan a POINT-lookup read of `path` for `keys` (values of the
    * sidecar's integral key column): keep a file iff its Bloom filter
    * admits at least one key. Probe positions are computed by the SAME
    * engine hash the build used (one bounded |keys|-row job — never a
    * driver-side hash reimplementation that could drift), the sidecar
    * is collected planning-side exactly like `prunedRead`'s stats.
    * Superset guarantee: false positives cost an extra file read;
    * callers apply the exact predicate to the returned frame. */
  def bloomPrunedRead(spark: org.apache.spark.sql.SparkSession,
                      path: String, keys: Seq[Long]): PrunedScan = {
    require(keys.nonEmpty, "bloomPrunedRead with no keys reads nothing")
    import spark.implicits._
    val bloomDf = spark.read.parquet(s"$path/$BloomDir")
      .withColumn("file", fileName(col("file")))
    // the filter's width travels with the store: slots are the sidecar's
    // b* columns, so probe and build can never disagree on geometry
    val slots = bloomDf.schema.fieldNames.count(_.startsWith("b"))
    val probes = keys.toDF("k")
      .select(probePositions(col("k"), slots * 64).zipWithIndex
        .map { case (p, i) => p.as(s"p$i") }: _*)
      .collect()
      .map(r => (0 until BloomProbes).map(r.getLong))
    val blooms = bloomDf.collect()
    requireSidecarCovers(listDataFiles(spark, path),
      blooms.toIndexedSeq.map(r => r.getString(r.fieldIndex("file"))),
      BloomDir, path)
    def bitSet(r: org.apache.spark.sql.Row, p: Long): Boolean = {
      val slot = r.getLong(r.fieldIndex(s"b${(p / 64).toInt}"))
      ((slot >>> (p % 64).toInt) & 1L) == 1L
    }
    val files = blooms.filter(r => probes.exists(_.forall(bitSet(r, _))))
      .map(r => s"$path/${r.getString(r.fieldIndex("file"))}")
    val schema = spark.read.parquet(path).schema
    val df =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
    PrunedScan(df, blooms.length, files.length)
  }

  /** Plan a read of `path` under `ranges` using the `_filestats`
    * sidecar: keep a file iff every range intersects its [min, max] on
    * that column (null extents — an all-null file — are kept: skipping
    * must never drop a file it cannot prove empty of matches). The
    * sidecar is O(files) and is read collect-side, exactly like a
    * catalog manifest at planning time. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
                 ranges: Seq[ColRange]): PrunedScan = {
    require(ranges.nonEmpty, "prunedRead with no ranges is a plain read")
    val stats = spark.read.parquet(s"$path/$StatsDir")
      .withColumn("file", fileName(col("file")))
    val keep = ranges.map { r =>
      val lo = col(s"${r.column}_min"); val hi = col(s"${r.column}_max")
      val intersects = stats.schema(s"${r.column}_min").dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
          // exact int64 comparison: min <= r.hi ⟺ min <= floor(r.hi)
          // and max >= r.lo ⟺ max >= ceil(r.lo) — floor/ceil are exact
          // transformations here, so no operand is ever rounded (a
          // double compare above 2^53 is superset-safe only via a
          // monotonicity argument; this needs no argument)
          val hiL = if (r.hi >= Long.MaxValue.toDouble) Long.MaxValue
                    else math.floor(r.hi).toLong
          val loL = if (r.lo <= Long.MinValue.toDouble) Long.MinValue
                    else math.ceil(r.lo).toLong
          lo.cast("long") <= lit(hiL) && hi.cast("long") >= lit(loL)
        case _ =>
          // fractional stats are exact doubles of double data — the
          // pre-native-stats sidecar format (double-cast extents) also
          // lands here, so old stores stay readable
          lo.cast("double") <= lit(r.hi) && hi.cast("double") >= lit(r.lo)
      }
      lo.isNull || hi.isNull || intersects
    }.reduce(_ && _)
    val rows = stats.select(col("file"), keep.as("keep")).collect()
    requireSidecarCovers(listDataFiles(spark, path),
      rows.toIndexedSeq.map(_.getString(0)), StatsDir, path)
    val files = rows.filter(_.getBoolean(1)).map(r => s"$path/${r.getString(0)}")
    val schema = spark.read.parquet(path).schema
    val df =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
    PrunedScan(df, rows.length, files.length)
  }
}
