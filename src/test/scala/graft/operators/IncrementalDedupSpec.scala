package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incrementalLshPairs finds new-vs-seen dups and never pairs within a side") {
    val seen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated corpus content about databases and queries"))
      .toDF("doc_id", "text")
    val newBatch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"), // dup of 1
      (12L, "fresh never seen words in this brand new document"),
      (13L, "identical twin inside the new batch only right here"),
      (14L, "identical twin inside the new batch only right here")) // dup of 13 — must NOT surface
      .toDF("doc_id", "text")
    val pairs = Dedup.incrementalLshPairs(newBatch, seen, "doc_id", "text",
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((11L, 1L)))
    assert(pairs.forall { case (n, s) => Set(11L, 12L, 13L, 14L)(n) && Set(1L, 2L)(s) },
      s"cross-side contract violated: $pairs")
    assert(!pairs.exists { case (n, _) => n == 13L || n == 14L },
      "new-vs-new duplicate must not appear in incremental output")
  }

  test("chunkExactDedup keeps the first (doc, idx) occurrence of every chunk") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),          // full span dup of doc 1
      (3L, "a b c d e f g h"))  // first half duplicates doc 1's chunks
      .toDF("doc_id", "text")
    val got = Dedup.chunkExactDedup(docs, "doc_id", "text", chunkSize = 2)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getBoolean(3))).toMap
    assert(got((1L, 0)) && got((1L, 1)))                    // doc 1 owns both chunks
    assert(!got((2L, 0)) && !got((2L, 1)))                  // doc 2 fully shadowed
    assert(!got((3L, 0)) && !got((3L, 1)))                  // shared span shadowed
    assert(got((3L, 2)) && got((3L, 3)))                    // unique tail kept
  }

  test("bloomDupCandidates equals the exact semi-join (no false negatives; FPs verified away)") {
    val corpus = (1L to 50L).map(i => (i, s"document number $i payload")).toDF("doc_id", "text")
    val newBatch = (40L to 60L).map(i => (i + 1000L, s"document number $i payload"))
      .toDF("doc_id", "text")
    val got = Dedup.bloomDupCandidates(newBatch, corpus, "doc_id", "text",
      expectedItems = 100L, fpp = 0.01)
      .collect().map(_.getLong(0)).toSet
    val exact = newBatch.select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpus.select(md5(col("text")).as("h")), Seq("h"), "left_semi")
      .select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == exact)
    assert(got == (40L to 50L).map(_ + 1000L).toSet)
  }
}
