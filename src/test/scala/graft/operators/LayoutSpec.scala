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

  test("constant and null-free single-column z-order degrades to a plain range layout") {
    val df = spark.range(100).select(col("id"), lit(42).as("c"))
    val out = Layout.zorderBy(df, Seq("c", "id"), 4)
    assert(out.count() == 100) // constant column collapses to bucket 0, no crash
  }
}
