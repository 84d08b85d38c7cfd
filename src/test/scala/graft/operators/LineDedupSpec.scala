package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(maxDocs: Long, rows: (Long, String)*) =
    Dedup.dedupLines(rows.toDF("doc_id", "text"), "doc_id", "text", maxDocs)
      .orderBy("doc_id")
      .as[(Long, Int, Long, String)].collect().toSeq

  test("lines recurring in more than maxDocs documents are dropped; unique lines survive in order") {
    val header = "COOKIE BANNER"
    val out = run(2,
      (1L, s"$header\nalpha one\nbravo"),
      (2L, s"$header\ncharlie two"),
      (3L, s"$header\ndelta three\necho"),
      (4L, s"unique doc\n$header")) // header in 4 docs > maxDocs=2
    assert(out == Seq(
      (1L, 3, 2L, "alpha one\nbravo"),
      (2L, 2, 1L, "charlie two"),
      (3L, 3, 2L, "delta three\necho"),
      (4L, 2, 1L, "unique doc")))
  }

  test("frequency counts DISTINCT documents: a line repeated inside one doc is not boilerplate") {
    val out = run(1,
      (1L, "same line\nsame line\nsame line"), // 3 copies, but 1 document
      (2L, "other text"))
    assert(out.head == ((1L, 3, 3L, "same line\nsame line\nsame line")))
  }

  test("normalization is lower+trim for counting, but original line text is preserved") {
    val out = run(1,
      (1L, "  Legal Notice  \nbody a"),
      (2L, "legal notice\nbody b"),
      (3L, "LEGAL NOTICE\nbody c")) // all three normalize to the same line
    assert(out == Seq(
      (1L, 2, 1L, "body a"),
      (2L, 2, 1L, "body b"),
      (3L, 2, 1L, "body c")))
  }

  test("blank lines are structure: never counted, always kept; fully-deduped docs yield empty text") {
    val out = run(1,
      (1L, "promo\n\nkeep me"),
      (2L, "promo\n\nme too"),
      (3L, "promo")) // only line is boilerplate → empty doc
    assert(out == Seq(
      (1L, 3, 2L, "\nkeep me"),
      (2L, 3, 2L, "\nme too"),
      (3L, 1, 0L, "")))
  }
}
