package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityScoreSpec extends AnyFunSuite {

  test("stripHtml: blocks vanish, tags vanish, entities decode after tags, whitespace normalizes") {
    val spark0 = graft.TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val html = "<html><head><style>p{x:1}</style><script>if(a<b){}</script></head>" +
      "<body><h1>Title</h1>\n<p class=\"x\">Hello &amp; welcome to &lt;graft&gt;." +
      "&nbsp;&quot;quoted&#39;</p></body></html>"
    val out = Seq(html).toDF("t")
      .select(graft.functions.TextFunctions.stripHtml(col("t")).as("c"))
      .as[String].head()
    assert(out == "Title Hello & welcome to <graft>. \"quoted'")
    // idempotent on already-clean prose without angle brackets
    val plain = "just ordinary text"
    val again = Seq(plain).toDF("t")
      .select(graft.functions.TextFunctions.stripHtml(col("t")).as("c"))
      .as[String].head()
    assert(again == plain)
    // comparison prose survives: a tag must start with a letter, so
    // "< 10" / "> 3" are NOT treated as markup
    val math = "Prices: 5 < 10 and x > 3"
    val mathOut = Seq(math).toDF("t")
      .select(graft.functions.TextFunctions.stripHtml(col("t")).as("c"))
      .as[String].head()
    assert(mathOut == math, s"comparison prose must survive: '$mathOut'")
    // <styles> is NOT a style block: only its tags strip, content stays
    val styles = "<styles>keep this text</styles> and </script> alone"
    val stylesOut = Seq(styles).toDF("t")
      .select(graft.functions.TextFunctions.stripHtml(col("t")).as("c"))
      .as[String].head()
    assert(stylesOut == "keep this text and alone", s"got '$stylesOut'")
  }
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(texts: String*): Seq[Option[Double]] =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), TextFunctions.qualityScore(col("text")).as("q"))
      .orderBy("id")
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))).toSeq

  test("scores are probabilities; fluent text above punctuation soup; empty text is null") {
    val Seq(fluent, soup, caps, empty) = scores(
      "the cat sat on the mat and looked out of the window to the garden in peace",
      "!!! ??? ;;; ... ,,, ::: !!!",
      "THE LOUD DOCUMENT SHOUTS IN ALL CAPS FOREVER AND EVER",
      "")
    assert(fluent.exists(s => s > 0.0 && s < 1.0))
    assert(soup.exists(s => s > 0.0 && s < 1.0))
    assert(fluent.get > soup.get, s"fluent $fluent should outrank punctuation soup $soup")
    assert(fluent.get > caps.get, s"fluent $fluent should outrank all-caps $caps")
    assert(empty.isEmpty, "token-free text must score null, not a silent number")
  }

  test("score matches an independent scalar computation of the documented formula") {
    val text = "the cat and a dog of note went to town in a hurry"
    val toks = text.split("\\s+").toSeq
    val stop = toks.count(Set("the", "a", "and", "of", "to", "in")).toDouble / toks.size
    val punct = text.count(".,!?;:".toSet).toDouble / text.length
    val upper = text.count(_.isUpper).toDouble / text.length
    val z = -1.5 + 3.0 * stop - 8.0 * punct - 2.0 * upper +
      0.35 * math.log(1.0 + toks.size)
    val expected = java.math.BigDecimal.valueOf(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(scores(text).head.contains(expected))
  }
}
