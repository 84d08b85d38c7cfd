package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave produces the textbook Morton code") {
    // x=0b0011 (3), y=0b0101 (5), 4 bits; x bit j → position 2j+1,
    // y bit j → position 2j: z = 0b00011011 = 27
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.interleave(Seq(col("x"), col("y")), 4).as("z"))
      .as[Long].head()
    assert(z == 27L)
  }

  test("z-order keeps EVERY clustering column's per-partition range narrow") {
    // a shuffled 100×100 grid: the worst case for any single-column sort
    val grid = spark.range(10000)
      .select((col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"))
      .repartition(32) // destroy incoming order
    val nParts = 16

    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val ext = Layout.partitionExtents(df, Seq("x", "y"))
        .select((col("x_max") - col("x_min")).cast("double"),
          (col("y_max") - col("y_min")).cast("double"))
        .as[(Double, Double)].collect()
      (ext.map(_._1).sum / ext.length, ext.map(_._2).sum / ext.length)
    }

    val (zx, zy) = avgRanges(Layout.zorderBy(grid, Seq("x", "y"), nParts))
    val (sx, sy) = avgRanges(
      grid.repartitionByRange(nParts, col("x")).sortWithinPartitions("x"))

    // single-column sort: x is tight but y spans the whole domain —
    // a predicate on y prunes nothing
    assert(sx < 15, s"x-sort x-range $sx")
    assert(sy > 90, s"x-sort y-range $sy")
    // z-order: BOTH dimensions stay bounded → both predicates prune
    assert(zx < 60, s"zorder x-range $zx")
    assert(zy < 60, s"zorder y-range $zy")
    assert(zx + zy < sx + sy, "z-order total extent must beat linear sort")
  }

  test("rows survive the layout pass unchanged and sorted by z within partitions") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") * 7 % 97).as("a"), (col("id") * 13 % 89).as("b"))
    val out = Layout.zorderBy(df, Seq("a", "b"), 8)
    assert(out.columns.toSeq == df.columns.toSeq) // _zval is dropped
    assert(out.count() == 1000)
    assert(out.select(sum("id")).as[Long].head() == (0L until 1000L).sum)
  }

  test("z-order reads strictly fewer files AND rows than a linear sort under a 2-D predicate") {
    // the end-to-end pruning proof: write both layouts to parquet, then
    // (a) count files whose min/max stats intersect the predicate box —
    // what any stats-based pruner (parquet row-group skip, lakehouse
    // manifest) must read — and (b) execute the filtered scan and read
    // the leaf scan's numOutputRows metric: with filter pushdown the
    // parquet reader skips row groups on those same stats, so the rows
    // that actually leave the scan measure real, runtime pruning.
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = spark.range(10000)
      .select((col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"))
      .repartition(32)
    Layout.zorderBy(grid, Seq("x", "y"), 16).write.parquet(s"$root/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/linear")

    // predicate box: x ∈ [0,59] (wide) ∧ y ∈ [10,19] (narrow) — the
    // shape where a single-column sort is blind on the second dimension
    def boxFilter(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x").between(0, 59) && col("y").between(10, 19))

    def filesHit(dir: String): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("xlo"), max("x").as("xhi"),
          min("y").as("ylo"), max("y").as("yhi"))
      (stats.filter(col("xhi") >= 0 && col("xlo") <= 59 &&
        col("yhi") >= 10 && col("ylo") <= 19).count(), stats.count())
    }
    def rowsScanned(dir: String): Long = {
      val df = boxFilter(spark.read.parquet(dir))
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves().flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    }

    val (zHit, zTotal) = filesHit(s"$root/z")
    val (lHit, lTotal) = filesHit(s"$root/linear")
    assert(zTotal >= 8 && lTotal >= 8, s"expected ~16 files per layout ($zTotal, $lTotal)")
    assert(zHit < lHit, s"z-order must hit fewer files: z=$zHit/$zTotal linear=$lHit/$lTotal")

    val (zRows, lRows) = (rowsScanned(s"$root/z"), rowsScanned(s"$root/linear"))
    assert(zRows > 0 && lRows > 0, "scan metrics must be populated")
    assert(zRows < lRows, s"z-order must scan fewer rows at runtime: z=$zRows linear=$lRows")
    assert(lRows < 10000, "pushdown inactive: linear scan read the whole table")
  }

  test("constant and null-free single-column z-order degrades to a plain range layout") {
    val df = spark.range(100).select(col("id"), lit(42).as("c"))
    val out = Layout.zorderBy(df, Seq("c", "id"), 4)
    assert(out.count() == 100) // constant column collapses to bucket 0, no crash
  }

  test("writeClustered + prunedRead: loss-free skipping, hidden sidecar, pruning that actually prunes") {
    val root = java.nio.file.Files.createTempDirectory("graft_skip").toString
    val grid = spark.range(10000)
      .select((col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"),
        col("id").as("payload"))
      .repartition(32)
    Layout.writeClustered(grid, s"$root/t", Seq("x", "y"), 16)

    // the `_filestats` sidecar must be invisible to a plain read
    // (underscore convention): full table, original schema, exact rows
    val plain = spark.read.parquet(s"$root/t")
    assert(plain.columns.toSet == Set("x", "y", "payload"))
    assert(plain.count() == 10000)

    // a 2-D box covering ~6% of the plane: pruned scan must read fewer
    // files than the store holds, and pruned + residual == full filter
    val scan = Layout.prunedRead(spark, s"$root/t",
      Seq(Layout.ColRange("x", 0, 59), Layout.ColRange("y", 10, 19)))
    assert(scan.filesTotal >= 8, s"expected ~16 files, saw ${scan.filesTotal}")
    assert(scan.filesRead < scan.filesTotal,
      s"no pruning: read ${scan.filesRead} of ${scan.filesTotal}")
    def residual(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x").between(0, 59) && col("y").between(10, 19))
    val pruned = residual(scan.df).select("payload").as[Long].collect().sorted
    val full = residual(plain).select("payload").as[Long].collect().sorted
    assert(pruned.toSeq == full.toSeq, "skipping lost or duplicated rows")
    assert(pruned.nonEmpty)

    // a box outside the domain prunes everything and still answers
    val empty = Layout.prunedRead(spark, s"$root/t",
      Seq(Layout.ColRange("x", 1000, 2000)))
    assert(empty.filesRead == 0 && empty.df.count() == 0)
    assert(empty.df.schema == plain.schema)
  }

  test("file stats stay exact for int64 keys above 2^53 (native-typed sidecar)") {
    val root = java.nio.file.Files.createTempDirectory("graft_bigkey_spec").toString
    // snowflake-scale ids: doubles near 2^60 are spaced 256 apart, so a
    // double-cast sidecar could not even REPRESENT these extents
    val base = 1L << 60
    val data = spark.range(1024)
      .select((col("id") * 1000000L + base).as("k"), (col("id") % 7).as("v"))
    Layout.writeClustered(data, s"$root/t", Seq("k"), numPartitions = 8)
    // stats must carry the native long type, not a rounded double
    val statsType = spark.read.parquet(s"$root/t/_filestats").schema("k_min").dataType
    assert(statsType == org.apache.spark.sql.types.LongType, s"got $statsType")
    // a narrow range deep in the >2^53 regime: pruned scan + residual
    // must return exactly the covered keys
    val lo = base + 500L * 1000000L
    val hi = base + 503L * 1000000L
    val scan = Layout.prunedRead(spark, s"$root/t",
      Seq(Layout.ColRange("k", lo.toDouble, hi.toDouble)))
    assert(scan.filesRead < scan.filesTotal, s"read ${scan.filesRead} of ${scan.filesTotal}")
    val got = scan.df.filter(col("k") >= lo && col("k") <= hi)
      .select("k").as[Long].collect().toSet
    assert(got == (500L to 503L).map(i => base + i * 1000000L).toSet)
  }

  test("bloom sidecar: point lookups prune files and the superset is loss-free") {
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_spec").toString
    val data = spark.range(4096).select(col("id").as("k"), (col("id") * 7).as("payload"))
    Layout.writeClustered(data, s"$root/t", Seq("k"), numPartitions = 16)
    Layout.writeBloomSidecar(spark, s"$root/t", "k")

    val keys = Seq(17L, 1000L, 4000L)
    val scan = Layout.bloomPrunedRead(spark, s"$root/t", keys)
    // 3 point keys over 16 clustered files: ≥13 files must drop even
    // with ~2% FP per (key, file) probe
    assert(scan.filesRead < scan.filesTotal && scan.filesRead <= 5,
      s"bloom lookup read ${scan.filesRead} of ${scan.filesTotal} files")
    // superset guarantee: residual filter reproduces the full scan
    val got = scan.df.filter(col("k").isin(keys: _*))
      .select("k", "payload").as[(Long, Long)].collect().toSet
    assert(got == keys.map(k => (k, k * 7)).toSet)

    // an absent key matches no file bits beyond FP noise — still a
    // correct (empty) answer through the residual
    val miss = Layout.bloomPrunedRead(spark, s"$root/t", Seq(999999L))
    assert(miss.filesRead <= 2, s"absent key read ${miss.filesRead} files")
    assert(miss.df.filter(col("k") === 999999L).count() == 0)
  }

  test("sidecar drift fails loudly: files appended after the sidecar abort every pruned read") {
    val root = java.nio.file.Files.createTempDirectory("graft_drift_spec").toString
    val data = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("payload"))
    Layout.writeClustered(data, s"$root/t", Seq("k"), numPartitions = 4)
    Layout.writeBloomSidecar(spark, s"$root/t", "k")
    // sanity: both readers work before the drift
    assert(Layout.prunedRead(spark, s"$root/t",
      Seq(Layout.ColRange("k", 0, 10))).df.count() > 0)
    assert(Layout.bloomPrunedRead(spark, s"$root/t", Seq(5L)).filesRead >= 1)

    // an out-of-band append the sidecar knows nothing about — a pruned
    // scan that silently excluded it would be silent data loss
    spark.range(5000, 5100).select(col("id").as("k"), (col("id") * 3).as("payload"))
      .coalesce(1).write.mode("append").parquet(s"$root/t")
    val e1 = intercept[IllegalArgumentException] {
      Layout.prunedRead(spark, s"$root/t", Seq(Layout.ColRange("k", 0, 10)))
    }
    assert(e1.getMessage.contains("NOT covered"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Layout.bloomPrunedRead(spark, s"$root/t", Seq(5L))
    }
    assert(e2.getMessage.contains("NOT covered"), e2.getMessage)

    // rebuilding the sidecars clears the drift — and the refreshed
    // pruned scan now SEES the appended rows through the residual
    Layout.writeClustered(spark.read.parquet(s"$root/t"), s"$root/t2",
      Seq("k"), numPartitions = 4)
    val healed = Layout.prunedRead(spark, s"$root/t2",
      Seq(Layout.ColRange("k", 5000, 5099)))
    assert(healed.df.filter(col("k").between(5000, 5099)).count() == 100)
  }

  test("a moved/copied store resolves sidecar files against the read-time root") {
    val root = java.nio.file.Files.createTempDirectory("graft_move_spec").toString
    val data = spark.range(2048).select(col("id").as("k"), (col("id") * 5).as("payload"))
    Layout.writeClustered(data, s"$root/orig", Seq("k"), numPartitions = 8)
    Layout.writeBloomSidecar(spark, s"$root/orig", "k")
    // copy the store wholesale, then DELETE the original — an absolute-
    // path sidecar would now read dead URIs (or, worse, stale data if
    // the original survived); relative resolution must read the copy
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(s"$root/orig"), new java.io.File(s"$root/moved"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$root/orig"))

    val scan = Layout.prunedRead(spark, s"$root/moved",
      Seq(Layout.ColRange("k", 100, 120)))
    assert(scan.filesRead < scan.filesTotal)
    assert(scan.df.filter(col("k").between(100, 120)).count() == 21)

    val bloom = Layout.bloomPrunedRead(spark, s"$root/moved", Seq(77L))
    assert(bloom.df.filter(col("k") === 77L)
      .select("payload").as[Long].collect().toSeq == Seq(385L))
  }

  test("partitioned/nested stores fail loudly at BUILD time, naming the cause") {
    // a hive-partitioned write puts data files in subdirectories the
    // basename-keyed sidecar can never address; without the up-front
    // contract check, every later pruned read would fail with a
    // misleading 'deleted/moved?' drift message that stats-refresh can
    // never heal. The failure must happen at refresh time and say WHY.
    val root = java.nio.file.Files.createTempDirectory("graft_nested_spec").toString
    spark.range(100)
      .select(col("id").as("k"), (col("id") % 3).as("part"))
      .write.partitionBy("part").parquet(s"$root/t")
    val e = intercept[IllegalArgumentException] {
      Layout.refreshStats(spark, s"$root/t", Seq("k"))
    }
    assert(e.getMessage.contains("FLAT parquet store"), e.getMessage)
    assert(e.getMessage.contains("part="), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Layout.writeBloomSidecar(spark, s"$root/t", "k")
    }
    assert(e2.getMessage.contains("FLAT parquet store"), e2.getMessage)
  }
}
