package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Window-assignment boundary semantics, mirroring the reference's own
  * unit expectations (reference: tests/test_windows.py:5-36):
  *  - tumbling size 10 s: ts 12.5→[10,20); 10.0→[10,20); 9.9→[0,10)
  *    (end-exclusive)
  *  - sliding size 10 s slide 5 s: ts 12.0→{[5,15),[10,20)} and NOT
  *    [0,10) or [15,25)
  */
class WindowSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tsDf(epochSecs: Double*) =
    epochSecs.toSeq.toDF("sec")
      .select(timestamp_seconds(col("sec")).as("ts"))

  test("tumbling 10s is end-exclusive (reference tests/test_windows.py:5-20)") {
    val t = TumblingWindow(10000)
    val got = tsDf(12.5, 10.0, 9.9)
      .select(col("ts"), t.toColumn(col("ts")).as("w"))
      .select(col("w.start").cast("double").as("ws"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(10.0, 10.0, 0.0))
  }

  test("sliding 10s/5s backtracks exactly the covering windows (:22-36)") {
    val s = SlidingWindow(10000, 5000)
    val got = tsDf(12.0)
      .select(s.toColumn(col("ts")).as("w"))
      .select(col("w.start").cast("double").as("ws"))
      .collect().map(_.getDouble(0)).toSet
    assert(got == Set(5.0, 10.0))
  }

  test("session 10s gap merges within gap, splits beyond (reference pspf/stream.py:415-451)") {
    // events at 0, 5, 30 for one key → sessions [0, 5+gap) and [30, 30+gap)
    val df = Seq(("k", 0.0), ("k", 5.0), ("k", 30.0)).toDF("key", "sec")
      .select(col("key"), timestamp_seconds(col("sec")).as("ts"))
    val sw = SessionWindow(10000)
    val got = df.groupBy(sw.toColumn(col("ts")).as("w"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("double"), col("w.end").cast("double"), col("n"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set((0.0, 15.0, 2L), (30.0, 40.0, 1L)))
  }
}
