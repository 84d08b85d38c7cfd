package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("near-identical vectors collapse to the lowest id; orthogonal ones survive") {
    val df = emb(
      (0L, Array(1f, 0f)),
      (1L, Array(0f, 1f)),
      (2L, Array(0.999f, 0.01f)), // ~parallel to vec 0
      (3L, Array(0.01f, 0.999f))) // ~parallel to vec 1
    val out = Similarity.semDedup(df, "vec_id", "embedding", nCentroids = 2, threshold = 0.9)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Double], Boolean)].collect()
    // centroids = vecs 0 and 1; 2 joins cluster 0, 3 joins cluster 1
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 0L, 1L))
    assert(out.map(_._4).toSeq == Seq(false, false, true, true))
    // survivors of the filter are exactly the representatives
    assert(out.filter(!_._4).map(_._1).toSeq == Seq(0L, 1L))
  }

  test("the lowest id of every cluster has no lower-id mate: null cos, never dropped") {
    val df = emb((10L, Array(1f, 0f)), (11L, Array(1f, 0f)), (12L, Array(1f, 0f)))
    val out = Similarity.semDedup(df, "vec_id", "embedding", nCentroids = 1, threshold = 0.99)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Double], Boolean)].collect()
    assert(out(0) == ((10L, 10L, None, false))) // exact dup of itself upstream — still the rep
    assert(out(1)._3.contains(1.0) && out(1)._4)
    assert(out(2)._3.contains(1.0) && out(2)._4)
  }

  test("threshold is inclusive and applied to the 6-d.p.-rounded cosine") {
    // cos(a,b) = 0.8 exactly after rounding: a=[1,0], b=[0.8, 0.6]
    val df = emb((0L, Array(1f, 0f)), (1L, Array(0.8f, 0.6f)))
    def dropped(t: Double) =
      Similarity.semDedup(emb((0L, Array(1f, 0f)), (1L, Array(0.8f, 0.6f))),
          "vec_id", "embedding", nCentroids = 1, threshold = t)
        .orderBy("vec_id").as[(Long, Long, Option[Double], Boolean)].collect()(1)._4
    assert(dropped(0.8))      // >= is inclusive
    assert(!dropped(0.800001))
  }

  test("assignment matches ivfTopK's quantizer: same clusters on real data") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.semDedup(df, "vec_id", "embedding", nCentroids = 8, threshold = 0.5)
    assert(out.count() == df.count()) // every vector surfaces exactly once
    val nClusters = out.select("cluster").distinct().count()
    assert(nClusters <= 8 && nClusters >= 2)
  }
}
