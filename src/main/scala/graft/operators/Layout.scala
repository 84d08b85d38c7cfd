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
}
