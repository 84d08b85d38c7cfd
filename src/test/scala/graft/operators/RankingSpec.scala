package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry date"))

  private def roundHalfUp6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("bm25 matches an independent scalar reimplementation of the formula") {
    val docs = corpus.toDF("doc_id", "text")
    val terms = Seq("apple", "banana")
    val got = Ranking.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap

    // independent computation with plain scala.math
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val (k1, b) = (1.2, 0.75)
    def tf(id: Long, t: String) = toks(id).count(_ == t).toDouble
    def df(t: String) = toks.values.count(_.contains(t)).toDouble
    def score(id: Long): Double = terms.map { t =>
      val f = tf(id, t)
      if (f == 0) 0.0
      else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
        (f * (k1 + 1.0)) /
        (f + k1 * ((1.0 - b) + (b * toks(id).size) / avgdl))
    }.sum

    assert(got.keySet == Set(1L, 2L)) // doc 3 matches no term
    assert(got(1L)._1 == 2 && got(2L)._1 == 1)
    assert(got(1L)._2 == roundHalfUp6(score(1L)))
    assert(got(2L)._2 == roundHalfUp6(score(2L)))
    // the doc matching both terms (one of them twice) outranks the other
    assert(got(1L)._2 > got(2L)._2)
  }

  test("tfIdf: exact tf/df and smoothed idf weighting") {
    val docs = corpus.toDF("doc_id", "text")
    val rows = Ranking.tfIdf(docs, "doc_id", "text", Seq("apple", "cherry"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // apple: df 1; cherry: df 2; N = 3
    assert(rows((1L, "apple"))._1 == 2 && rows((1L, "apple"))._2 == 1)
    assert(rows((2L, "cherry"))._1 == 1 && rows((2L, "cherry"))._2 == 2)
    val idfApple = math.log(4.0 / 2.0) + 1.0
    assert(rows((1L, "apple"))._3 == roundHalfUp6(2.0 * idfApple))
    // rarer term weighs more at equal tf
    assert(rows((3L, "cherry"))._3 ==
      roundHalfUp6(math.log(4.0 / 3.0) + 1.0))
  }

  test("bm25 scoring is layout-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Ranking.bm25(docs, "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = Ranking.bm25(docs.repartition(13), "doc_id", "text", Seq("spark", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("ngramNovelty: shared shingles score 0, unique prose scores 1, short docs surface") {
    val docs = Seq(
      // 1 and 2 are identical: every shingle is shared → novelty 0
      (1L, "one two three four"),
      (2L, "one two three four"),
      // 3 shares nothing → novelty 1 (two distinct shingles)
      (3L, "five six seven eight"),
      // 4 is below the shingle size → zero shingles, novelty 0
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Ranking.ngramNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 0L, 0.0),
      (2L, 2L, 0L, 0.0),
      (3L, 2L, 2L, 1.0),
      (4L, 0L, 0L, 0.0)))
  }
}
