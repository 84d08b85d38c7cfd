package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decomposed accents compose to the canonical form") {
    // "é" decomposed (e + combining acute) vs precomposed U+00E9
    val decomposed = "Café"
    val composed = "Café"
    val got = Seq((1L, decomposed), (2L, composed), (3L, "ascii only"))
      .toDF("id", "t")
      .select(col("id"), NormalizeFunctions.nfcNormalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == composed, "decomposed form must compose under NFC")
    assert(got(2L) == composed)
    assert(got(3L) == "ascii only")
  }

  test("normalized forms fingerprint identically — the dedup motivation") {
    val d = Seq((1L, "Café"), (2L, "Café")).toDF("id", "t")
    val hashes = d
      .select(md5(NormalizeFunctions.nfcNormalize(col("t"))).as("h"))
      .as[String].collect().toSet
    assert(hashes.size == 1, "NFC-equal texts must share one fingerprint")
    val raw = d.select(md5(col("t")).as("h")).as[String].collect().toSet
    assert(raw.size == 2, "without NFC the same text hashes differently")
  }

  test("nulls stay null; non-Latin scripts and surrogate pairs round-trip") {
    val got = Seq((1L, null: String), (2L, "日本語 😀"),
      (3L, "ẛ̣")) // ſ + dot-below + dot-above (NFC reorders marks)
      .toDF("id", "t")
      .select(col("id"), NormalizeFunctions.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains("日本語 😀"))
    assert(got(3L).contains(java.text.Normalizer.normalize("ẛ̣",
      java.text.Normalizer.Form.NFC)))
  }

  test("interpreted eval agrees with the codegen path") {
    val rows = Seq("Café", "åb́c", "", "plain")
    val viaExpr = rows.map { s =>
      NfcNormalize.normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    }
    val viaPlan = rows.zipWithIndex.map(_.swap).toDF("id", "t")
      .orderBy("id")
      .select(NormalizeFunctions.nfcNormalize(col("t")))
      .as[String].collect().toSeq
    assert(viaPlan == viaExpr)
  }
}
