package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("overlap stats: exact fraction of shared n-grams, zero for disjoint docs") {
    val eval = df((100L, "the quick brown fox jumps over the lazy dog"))
    val train = df(
      (1L, "the quick brown fox jumps somewhere else entirely today"), // shares a prefix
      (2L, "completely different words with no common trigram here"),
      (3L, "the quick brown fox jumps over the lazy dog")) // verbatim copy
    val out = Decontaminate.overlapStats(train, eval, "doc_id", "text", n = 3, flagFrac = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    // doc 1: 9 tokens → 7 distinct trigrams, 3 shared
    // ("the quick brown","quick brown fox","brown fox jumps")
    assert(out(0) == ((1L, 7L, 3L, 3.0 / 7, false)))
    assert(out(1) == ((2L, 6L, 0L, 0.0, false)))
    // doc 3 = the eval doc: 7 trigrams, all shared
    assert(out(2) == ((3L, 7L, 7L, 1.0, true)))
  }

  test("short docs (fewer than n tokens) surface with n_sh = 0, never flagged") {
    val eval = df((100L, "a b c d e"))
    val train = df((1L, "a b"), (2L, "a b c"))
    val out = Decontaminate.overlapStats(train, eval, "doc_id", "text", n = 3, flagFrac = 0.1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(out(0) == ((1L, 0L, 0L, 0.0, false))) // no trigrams at all
    assert(out(1) == ((2L, 1L, 1L, 1.0, true)))
  }

  test("decontaminate keeps exactly the below-threshold rows with original columns") {
    val eval = df((100L, "the quick brown fox jumps over the lazy dog"))
    val train = df(
      (1L, "the quick brown fox jumps somewhere else entirely today"),
      (3L, "the quick brown fox jumps over the lazy dog"))
    val kept = Decontaminate.decontaminate(train, eval, "doc_id", "text", n = 3, maxFrac = 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("bloomOverlapStats is bit-identical to the exact path (no-false-negative + exact verify)") {
    val eval = df(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs today"))
    val train = df(
      (1L, "the quick brown fox jumps somewhere else entirely today"),
      (2L, "completely different words with no common trigram here"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "pack my box with five dozen other things"),
      (5L, "a b")) // too short for trigrams
    val exact = Decontaminate.overlapStats(train, eval, "doc_id", "text", 3, 0.4)
      .orderBy("doc_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val bloom = Decontaminate.bloomOverlapStats(train, eval, "doc_id", "text", 3, 0.4,
        expectedEvalShingles = 1024)
      .orderBy("doc_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(bloom == exact)
    assert(exact.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L)) // every train row surfaced
  }

  test("bloom probe sits in the plan (prefilter really runs) and survives a tiny filter") {
    // an undersized filter raises fpp — results must STILL be exact,
    // only the prefilter's selectivity degrades
    val eval = df((100L, "u v w x y z"))
    val train = df((1L, "u v w completely unrelated"), (2L, "p q r s t u"))
    // the staged stats are eagerly checkpointed inside the call (so the
    // shingle cache can be released there) — the probe therefore runs
    // DURING the call, not in the returned lazy plan. Capture the
    // executed plans with a listener and assert the probe was in one.
    val executed = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        executed.add(qe.analyzed.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    import scala.jdk.CollectionConverters._
    // listener delivery is async — poll briefly for the probe's plan
    def probeSeen: Boolean = executed.asScala.exists(_.contains("might_contain"))
    val q = try {
      val r = Decontaminate.bloomOverlapStats(train, eval, "doc_id", "text", 3, 0.5,
        expectedEvalShingles = 4)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!probeSeen && System.nanoTime() < deadline) Thread.sleep(50)
      r
    } finally spark.listenerManager.unregister(listener)
    assert(probeSeen, "BloomFilterMightContain must appear in an executed plan")
    val exact = Decontaminate.overlapStats(train, eval, "doc_id", "text", 3, 0.5)
      .orderBy("doc_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(q.orderBy("doc_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq == exact)
  }

  test("bloomOverlapStats with an EMPTY eval side still reports true per-doc shingle counts") {
    // an empty build side makes BloomFilterAggregate return NULL; the
    // probe must treat that as definitely-absent, not drop every row
    val eval = df((100L, "a b")) // too short for trigrams → zero eval shingles
    val train = df((1L, "the quick brown fox jumps"), (2L, "x y"))
    val out = Decontaminate.bloomOverlapStats(train, eval, "doc_id", "text", 3, 0.5)
      .orderBy("doc_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L, 0.0, false), (2L, 0L, 0L, 0.0, false)))
  }

  test("overlap is computed on DISTINCT n-grams: repeats in train don't inflate the count") {
    val eval = df((100L, "x y z"))
    val train = df((1L, "x y z x y z x y z")) // trigram "x y z" appears 3 times
    val out = Decontaminate.overlapStats(train, eval, "doc_id", "text", n = 3, flagFrac = 0.9)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    // 7 trigram positions but 7 distinct strings? positions: xyz yzx zxy xyz yzx zxy xyz → 3 distinct
    assert(out(0)._2 == 3L) // n_sh counts distinct shingles
    assert(out(0)._3 == 1L) // only "x y z" is shared
  }

  private def vdf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("semanticOverlapStats: max eval cosine per train vector, flag both ways around the threshold") {
    val eval = vdf((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
    val train = vdf(
      (1L, Seq(2f, 0f)),    // cos 1.0 with eval 100
      (2L, Seq(1f, 1f)),    // cos ~0.707107 with both
      (3L, Seq(1f, -1f)))   // cos ~0.707107 with 100, 0 with 101 → max 0.707107
    val out = Decontaminate.semanticOverlapStats(train, eval, "vec_id", "embedding", flagCos = 0.9)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1.0, true), (2L, 0.707107, false), (3L, 0.707107, false)))
    // tighter threshold flips the middle rows, not row 1
    val strict = Decontaminate.semanticOverlapStats(train, eval, "vec_id", "embedding", flagCos = 0.7)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect().toSeq
    assert(strict.map(_._3) == Seq(true, true, true))
  }

  test("semantic check: zero-norm encoder-failure sentinel is cosine 0, never NaN-contaminated") {
    val eval = vdf((100L, Seq(0f, 0f)), (101L, Seq(1f, 0f)))
    val train = vdf((1L, Seq(0f, 0f)), (2L, Seq(0f, 3f)))
    val out = Decontaminate.semanticOverlapStats(train, eval, "vec_id", "embedding", flagCos = 0.5)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect().toSeq
    // zero train vec: cos 0 to everything; orthogonal train vec: max 0
    assert(out == Seq((1L, 0.0, false), (2L, 0.0, false)))
  }

  test("semantic check with an EMPTY eval set keeps every train row, max 0.0") {
    val train = vdf((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    val out = Decontaminate.semanticOverlapStats(
        train, vdf().filter(lit(false)), "vec_id", "embedding", flagCos = 0.5)
      .orderBy("vec_id").as[(Long, Double, Boolean)].collect().toSeq
    assert(out == Seq((1L, 0.0, false), (2L, 0.0, false)))
  }

  test("semanticDecontaminate keeps exactly the clean rows with original columns") {
    val eval = vdf((100L, Seq(1f, 0f)))
    val train = vdf((1L, Seq(5f, 0f)), (2L, Seq(0f, 2f)), (3L, Seq(1f, 10f)))
      .withColumn("extra", col("vec_id") * 10)
    val kept = Decontaminate.semanticDecontaminate(train, eval, "vec_id", "embedding", maxCos = 0.5)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding", "extra"))
    assert(kept.select("vec_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("span check: a verbatim quoted run flags; fresh and sub-k docs stay clean") {
    val eval = df((100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"))
    val train = df(
      (1L, "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4"), // quotes the benchmark whole
      (2L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"), // fresh text, same length
      (3L, "s1 s2")) // under k tokens: no grams at all
    val out = Decontaminate.spanOverlapStats(train, eval, "doc_id", "text",
        k = 3, w = 2, minShared = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect()
    assert(out(0)._3 >= 2 && out(0)._4,
      s"the verbatim quote must land >= 2 shared fingerprints: ${out(0)}")
    assert(out(1)._2 > 0 && out(1)._3 == 0 && !out(1)._4,
      s"fresh text must share nothing: ${out(1)}")
    assert(out(2) == ((3L, 0L, 0L, false)),
      s"a sub-k doc has nothing to leak: ${out(2)}")
  }

  test("spanLeakReport draws the quoted interval at the right offsets on one diagonal") {
    val eval = df((100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"))
    val train = df(
      (1L, "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4"), // quote at token offsets 2..11
      (2L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"))
    val out = Decontaminate.spanLeakReport(train, eval, "doc_id", "text",
        k = 3, w = 2, maxGap = 4, minFps = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1, s"exactly the quoted pair must report: ${out.mkString(";")}")
    val (tid, eid, ts, te, es, ee, n) = out.head
    assert(tid == 1L && eid == 100L && n >= 2)
    // the quote sits 2 tokens into the train doc: the matched interval
    // must sit on the diag-2 diagonal, inside both docs' quoted region
    assert(ts - es == 2 && te - ee == 2,
      s"interval must align on the +2 diagonal: ($ts,$te) vs ($es,$ee)")
    assert(ts >= 2 && te <= 13 && es >= 0 && ee <= 11)
  }

  test("spanRedact cuts exactly the reported intervals; clean docs pass canonicalized") {
    val eval = df((100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"))
    val train = df(
      (1L, "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4"),
      (2L, "f1  f2 f3 f4 f5 f6 f7 f8 f9 f10")) // double space: canonicalized
    val cuts = Decontaminate.spanLeakReport(train, eval, "doc_id", "text",
        k = 3, w = 2, maxGap = 4, minFps = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val out = Decontaminate.spanRedact(train, eval, "doc_id", "text",
        k = 3, w = 2, maxGap = 4, minFps = 2)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    // doc 1: exactly the reported interval's tokens are gone
    val toks1 = "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4".split(" ")
    val cutIdx = cuts.filter(_._1 == 1L)
      .flatMap(c => (c._3 to c._4)).toSet
    val expect1 = toks1.zipWithIndex.collect {
      case (t, i) if !cutIdx.contains(i.toLong) => t }.mkString(" ")
    assert(out(0) == ((1L, expect1, cutIdx.size.toLong)),
      s"redaction must cut exactly the reported interval: ${out(0)}")
    assert(!out(0)._2.contains("e5"), "the quote interior must be gone")
    assert(out(0)._2.startsWith("t1 t2") && out(0)._2.endsWith("t3 t4"))
    // doc 2: untouched but whitespace-canonicalized, zero cut
    assert(out(1) == ((2L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10", 0L)))
  }

  test("spanDecontaminate keeps exactly the clean rows with original columns") {
    val eval = df((100L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"))
    val train = df(
      (1L, "t1 t2 e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 t3 t4"),
      (2L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10"))
      .withColumn("extra", col("doc_id") * 10)
    val kept = Decontaminate.spanDecontaminate(train, eval, "doc_id", "text",
      k = 3, w = 2, minShared = 2)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "extra"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }
}
