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

  /** Z-order `df` over `cols`, write it to `path`, and commit a
    * per-file min/max stats sidecar for those columns. The sidecar scan
    * is one extra read of the fresh files (file-grouped min/max — at
    * write scale this is the cheapest moment the stats will ever be
    * computable); sidecar rows are one per data file. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     numPartitions: Int): Unit = {
    val spark = df.sparkSession
    zorderBy(df, cols, numPartitions).write.mode("overwrite").parquet(path)
    val exts = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}_min"),
      max(col(c).cast("double")).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
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
    val keep = ranges.map { r =>
      val lo = col(s"${r.column}_min"); val hi = col(s"${r.column}_max")
      lo.isNull || hi.isNull || (lo <= lit(r.hi) && hi >= lit(r.lo))
    }.reduce(_ && _)
    val rows = stats.select(col("file"), keep.as("keep")).collect()
    val files = rows.filter(_.getBoolean(1)).map(_.getString(0))
    val schema = spark.read.parquet(path).schema
    val df =
      if (files.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
    PrunedScan(df, rows.length, files.length)
  }
}
