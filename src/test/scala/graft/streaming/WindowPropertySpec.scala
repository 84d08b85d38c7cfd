package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style window-assignment invariants over ScalaCheck-generated
  * timestamps (SURVEY §5: property tests for assignment semantics),
  * evaluated in one Spark pass per property.
  */
class WindowPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tsGen = Gen.chooseNum(0.0, 1e6).map(t => math.rint(t * 1000) / 1000)
  private def sample(n: Int): Seq[Double] =
    Gen.listOfN(n, tsGen)(Gen.Parameters.default, Seed(42L)).get.distinct

  test("tumbling: start = floor(ts/size)*size, end = start + size, start <= ts < end") {
    val size = 10
    val df = sample(500).toDF("sec")
      .select(col("sec"), timestamp_seconds(col("sec")).as("ts"))
      .select(col("sec"), window(col("ts"), s"$size seconds").as("w"))
      .select(col("sec"), col("w.start").cast("double").as("ws"), col("w.end").cast("double").as("we"))
    val bad = df.filter(
      col("ws") =!= floor(col("sec") / size) * size ||
        col("we") =!= col("ws") + size ||
        col("sec") < col("ws") || col("sec") >= col("we"))
    assert(bad.count() == 0)
  }

  test("sliding: every ts lands in exactly size/slide windows, all covering it, starts multiple of slide") {
    val (size, slide) = (10, 5)
    val df = sample(500).toDF("sec")
      .select(col("sec"), window(timestamp_seconds(col("sec")), s"$size seconds", s"$slide seconds").as("w"))
      .select(col("sec"), col("w.start").cast("double").as("ws"), col("w.end").cast("double").as("we"))
    // each row here is one (ts, window) assignment
    val bad = df.filter(
      col("sec") < col("ws") || col("sec") >= col("we") ||
        col("we") =!= col("ws") + size ||
        pmod(col("ws").cast("long"), lit(slide)) =!= 0)
    assert(bad.count() == 0)
    val counts = df.groupBy("sec").count().filter(col("count") =!= size / slide)
    assert(counts.count() == 0)
  }
}
