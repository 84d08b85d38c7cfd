package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DimStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dimStats: hand-computed per-dimension mean/std/min/max") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val got = Similarity.dimStats(df, "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // dim 0: {1, 3} → mean 2, var (1+9)/2 − 4 = 1 → std 1
    assert(got(0) == ((2L, 1.0, 3.0, 2.0, 1.0)))
    // dim 1: {2, 4} → mean 3, std 1
    assert(got(1) == ((2L, 2.0, 4.0, 3.0, 1.0)))
  }

  test("dimStats is layout-invariant on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.dimStats(emb, "embedding").collect().map(_.toSeq).toSet
    val b = Similarity.dimStats(emb.repartition(11), "embedding").collect().map(_.toSeq).toSet
    assert(a == b && a.size == 64) // one row per dimension
  }
}
