package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("unigram LM counts tokens exactly") {
    val lm = LanguageModel.unigramLm(docs((1L, "a b a"), (2L, "b c")), "text")
    val got = lm.as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("cross-entropy matches the hand-computed add-one value") {
    // corpus: "a b a" + "b c" -> c(a)=2 c(b)=2 c(c)=1, N=5, V=3
    // p(a)=p(b)=3/8, p(c)=2/8; doc1 "a b a": mean of
    // round(-ln(3/8),6) three times = 0.980829; doc2 "b c":
    // (0.980829 + round(-ln(0.25),6)=1.386294)/2 = 1.1835615 -> rounds
    // HALF_UP to 1.183562 (Spark round on double) / check value
    val d = docs((1L, "a b a"), (2L, "b c"))
    val got = LanguageModel.selfCrossEntropy(d, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, Some(0.980829))))
    val x2 = got(2L)._2.get
    assert(math.abs(x2 - 1.1835615) < 1e-6, s"doc2 xent=$x2")
  }

  test("OOV tokens floor at the add-one rate; token-free docs keep a null-xent row") {
    val lm = LanguageModel.unigramLm(docs((1L, "a a a")), "text") // N=3, V=1
    val scored = LanguageModel.crossEntropy(
      docs((10L, "zzz"), (11L, ""), (12L, "a")), lm, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // OOV: -ln((0+1)/(3+1)) = ln 4 = 1.386294
    assert(scored(10L) == ((1L, Some(1.386294))))
    assert(scored(11L) == ((0L, None)))
    // in-vocab: -ln((3+1)/4) = 0
    assert(scored(12L) == ((1L, Some(0.0))))
  }

  test("gibberish scores strictly higher than a typical document") {
    val corpus = (1L to 40L).map(i => (i, "the quick brown fox jumps over the lazy dog")) :+
      (99L, "xqzv wvvk pqrst")
    val got = LanguageModel.selfCrossEntropy(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r._3.get).toMap
    assert(got(99L) > got(1L), s"gibberish ${got(99L)} !> typical ${got(1L)}")
  }
}
