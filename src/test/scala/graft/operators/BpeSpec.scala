package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE merge training: hand-computed merge sequences, one-pass
  * (non-overlapping) merge semantics, frequency weighting, and the
  * lexicographic tie-break. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def train(corpus: String, iters: Int): Seq[(Long, String, String, Long)] =
    Bpe.trainMerges(
      Bpe.wordFreqs(Seq((1L, corpus)).toDF("doc_id", "text"), "text"), iters)

  test("merges within a word are one-pass non-overlapping (aaa -> [aa, a])") {
    // "aaa": pairs (a,a)x2 -> merge 1 = (a,a,2); repr becomes [aa, a]
    // (the merged token must NOT re-merge with the trailing a in the
    // same pass), so merge 2 sees exactly one (aa, a) pair
    assert(train("aaa", 2) == Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)))
  }

  test("pair counts are word-frequency weighted") {
    // words: aa(x2), ab(x1) -> (a,a):2 beats (a,b):1
    val m = train("aa aa ab", 1)
    assert(m == Seq((1L, "a", "a", 2L)))
  }

  test("ties break on (left, right) lexicographic order") {
    // (a,b) and (c,d) both count 1 -> (a,b) wins
    assert(train("ab cd", 1).head == ((1L, "a", "b", 1L)))
  }

  test("learned merges compose across iterations (aaaa)") {
    // aaaa: (a,a):3 -> [aa, aa]; then (aa,aa):1 -> [aaaa]
    assert(train("aaaa", 2) == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("training stops early when the vocabulary exhausts (no pairs left)") {
    // "ab": one merge fully collapses the only word; asking for 5
    // yields the 1 learnable merge (the oracle's CTE chain likewise
    // produces no further rows)
    assert(train("ab", 5) == Seq((1L, "a", "b", 1L)))
    // single-character words have no adjacent pairs at all
    assert(train("a b c", 5).isEmpty)
  }

  test("merged symbols never false-match inside larger symbols") {
    // after merge (a,a) the word "aaab" is [aa, a, b]; merge (a,b)
    // must match the SINGLE a, not the tail of aa
    val m = train("aaab aaab ab", 2)
    assert(m(0) == ((1L, "a", "a", 4L))) // (a,a) twice per aaab
    // post-merge words: [aa,a,b](x2), [a,b](x1):
    // pairs (aa,a):2, (a,b):3 -> (a,b) wins with 3
    assert(m(1) == ((2L, "a", "b", 3L)))
  }
}
