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

  test("materialization cadence never changes the learned sequence") {
    val words = Bpe.wordFreqs(
      Seq((1L, "the theme theater then the them")).toDF("doc_id", "text"), "text")
    val reference = Bpe.trainMerges(words, 8, materializeEvery = 1000)
    assert(reference.size == 8)
    for (k <- Seq(1, 3, 7))
      assert(Bpe.trainMerges(words, 8, materializeEvery = k) == reference,
        s"materializeEvery=$k diverged")
  }

  test("120 merges train with bounded expression depth (the 30k-vocab shape)") {
    // one word of 121 DISTINCT chars: every adjacent pair has freq 1, so
    // the lexicographic tie-break always extends the prefix — merge k is
    // (first k chars, char k+1). A single un-rebased chain would be 120
    // replaces deep; materializeEvery=10 caps Catalyst at depth 10 and
    // keeps per-iteration work constant (the linear-time contract).
    val chars = (0x100 until 0x100 + 121).map(_.toChar)
    val words = Bpe.wordFreqs(Seq((1L, chars.mkString)).toDF("doc_id", "text"), "text")
      .persist()
    try {
      val m = Bpe.trainMerges(words, 120, materializeEvery = 10)
      assert(m.size == 120)
      m.zipWithIndex.foreach { case ((step, l, r, s), i) =>
        assert(step == i + 1 && l == chars.take(i + 1).mkString &&
          r == chars(i + 1).toString && s == 1L)
      }
    } finally words.unpersist()
  }

  test("a corpus word containing the U+001F sentinel fails fast") {
    val bad = Bpe.wordFreqs(
      Seq((1L, "ok bad" + Bpe.Sep + "word")).toDF("doc_id", "text"), "text")
    val e = intercept[Exception](bad.collect())
    // the INTENDED guard must fire, not just any failure: Spark wraps
    // raise_error's message, so search the cause chain for it
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("BPE sentinel U+001F")),
      s"expected the sentinel fail-fast, got: ${messages(e).mkString(" | ")}")
  }

  test("encode applies the trained merges per word, in token order") {
    val docs = Seq((1L, "aaab ab"), (2L, "ab aaab"), (3L, "")).toDF("doc_id", "text")
    // merges from train("aaab aaab ab", 2): (a,a) then (a,b);
    // aaab -> [aa, ab] (one-pass: aa then the single a merges with b),
    // ab -> [ab]
    val out = Bpe.encode(docs, "doc_id", "text", Seq(("a", "a"), ("a", "b")))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList))
    assert(out(0) == ((1L, 3L, List("aa", "ab", "ab"))))
    assert(out(1) == ((2L, 3L, List("ab", "aa", "ab"))))
    assert(out(2) == ((3L, 0L, Nil))) // token-free doc surfaces, empty
  }

  test("encode is invariant to the materialization cadence") {
    val docs = Seq((1L, "the theme then"), (2L, "theater them the")).toDF("doc_id", "text")
    val words = Bpe.wordFreqs(docs, "text")
    val merges = Bpe.trainMerges(words, 6).map { case (_, l, r, _) => (l, r) }
    val ref = Bpe.encode(docs, "doc_id", "text", merges, materializeEvery = 1000)
      .orderBy("doc_id").collect().toSeq
    val rebased = Bpe.encode(docs, "doc_id", "text", merges, materializeEvery = 2)
      .orderBy("doc_id").collect().toSeq
    assert(rebased == ref)
  }
}
