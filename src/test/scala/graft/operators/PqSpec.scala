package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8 vectors of dim 8, m = 2 subspaces of 4 — the first 4 are the
  // codebook prefix (k = 4)
  private def corpus = (0L until 8L).map { i =>
    (i, Array.tabulate(8)(j => (i * 10 + j).toFloat))
  }.toDF("vec_id", "embedding")

  test("codebook vectors encode to their own centroid id in every subspace") {
    val cb = Quantize.pqCodebooks(corpus, "vec_id", "embedding", dim = 8, m = 2, k = 4)
    assert(cb.count() == 8) // m × k rows
    val codes = Quantize.pqEncode(corpus, cb, "vec_id", "embedding", dim = 8, m = 2)
      .filter(col("vec_id") < 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // prefix vector i IS centroid i: zero distance to itself per subspace
    assert(codes.forall { case (id, _, code) => code == id },
      s"prefix vectors must self-encode: ${codes.mkString(", ")}")
  }

  test("ADC ranks a codebook-equal probe's own vector first with distance 0") {
    val cb = Quantize.pqCodebooks(corpus, "vec_id", "embedding", dim = 8, m = 2, k = 4)
    val codes = Quantize.pqEncode(corpus, cb, "vec_id", "embedding", dim = 8, m = 2)
    val probe = corpus.filter(col("vec_id") === 2)
    val top = Quantize.pqAdcTopK(codes, cb, probe, "vec_id", "embedding",
        dim = 8, m = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.head == ((2L, 0.0)), s"probe's own vector must rank first: ${top.toSeq}")
    assert(top.map(_._2).toSeq == top.map(_._2).toSeq.sorted, "ascending ADC order")
  }

  test("batch-probe ADC agrees with the single-probe form for each probe") {
    val cb = Quantize.pqCodebooks(corpus, "vec_id", "embedding", dim = 8, m = 2, k = 4)
    val codes = Quantize.pqEncode(corpus, cb, "vec_id", "embedding", dim = 8, m = 2)
    val batch = Quantize.pqAdcTopKAll(codes, cb, corpus.filter(col("vec_id") < 3),
        "vec_id", "embedding", dim = 8, m = 2, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val singles = (0L until 3L).flatMap { q =>
      Quantize.pqAdcTopK(codes, cb, corpus.filter(col("vec_id") === q),
          "vec_id", "embedding", dim = 8, m = 2, topK = 4)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1)))
        .filter(_._2 != q).take(3) // single-probe form includes self; drop + re-trim
    }.toSet
    assert(batch == singles, s"batch=$batch singles=$singles")
  }

  test("codes are bounded by k and every (vector, subspace) gets exactly one code") {
    val cb = Quantize.pqCodebooks(corpus, "vec_id", "embedding", dim = 8, m = 2, k = 4)
    val codes = Quantize.pqEncode(corpus, cb, "vec_id", "embedding", dim = 8, m = 2)
    assert(codes.count() == 16) // 8 vectors × 2 subspaces
    assert(codes.agg(max("code")).head.getLong(0) < 4)
    assert(codes.groupBy("vec_id", "sub").count().filter(col("count") =!= 1).isEmpty)
  }
}
