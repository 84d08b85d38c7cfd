package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int8 round-trip: error bounded by scale/2, cosine ~1 on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Quantize.stats(df, "vec_id", "embedding")
      .as[(Long, Double, Long, Double, Double)].collect()
    assert(out.length == df.count())
    out.foreach { case (id, scale, _, maxErr, cosDeq) =>
      assert(maxErr <= scale / 2 + 1e-12, s"vec $id err $maxErr vs scale $scale")
      assert(cosDeq > 0.999, s"vec $id cos_deq $cosDeq")
    }
  }

  test("codes: extreme element hits exactly ±127, all codes within range") {
    val df = Seq((0L, Array(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val q = df.select(Quantize.int8(col("embedding"), Quantize.scaleOf(col("embedding"))))
      .as[Array[Int]].head()
    assert(q(1) == -127) // the max-abs element
    assert(q(0) == 64 && q(2) == 32) // 0.5/ (1/127) = 63.5 → HALF_UP 64; 0.25 → 31.75 → 32
    assert(q.forall(c => c >= -127 && c <= 127))
  }

  test("zero vector: scale 0, all-zero codes, cosine defined as 0") {
    val df = Seq((0L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Quantize.stats(df, "vec_id", "embedding")
      .as[(Long, Double, Long, Double, Double)].head()
    assert(out == ((0L, 0.0, 0L, 0.0, 0.0)))
  }

  test("dequantize inverts int8 up to the quantization step") {
    val df = Seq((0L, Array(0.1f, -0.9f, 0.33f))).toDF("vec_id", "embedding")
    val rt = df.select(zip_with(col("embedding"),
        Quantize.dequantize(
          Quantize.int8(col("embedding"), Quantize.scaleOf(col("embedding"))),
          Quantize.scaleOf(col("embedding"))),
        (a, b) => abs(a.cast("double") - b)).as("errs"))
      .as[Array[Double]].head()
    val step = 0.9 / 127
    rt.foreach(e => assert(e <= step / 2 + 1e-12))
  }
}
