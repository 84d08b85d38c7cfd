package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val d = docs((1L, "same text here"), (2L, "same text here"), (3L, "different"))
    val got = Dedup.exact(d, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard computes the hand-checked value") {
    // 3-gram shingles: {a b c, b c d} vs {a b c, b c e}: inter=1 union=3
    val d = docs((1L, "a b c d"), (2L, "a b c e"))
    val got = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.0)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0 / 3.0)))
  }

  test("minhash LSH pairs identical docs, not disjoint ones") {
    val d = docs(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "x1 x2 x3 x4 x5 x6"))
    val got = Dedup.minhashLshPairs(d, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("winnowing guarantees a shared fingerprint for spans >= k+w-1 and compresses grams") {
    // k=3, w=2: any shared run of >= 4 tokens must land a common
    // fingerprint (the winnowing guarantee), entirely disjoint vocab
    // must land none. Docs 1 and 2 share the 4-token run "p q r s"
    // embedded in otherwise different text; doc 3 is disjoint.
    val d = docs(
      (1L, "a1 a2 p q r s a3 a4 a5 a6"),
      (2L, "b1 p q r s b2 b3 b4 b5 b6"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"))
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k = 3, w = 2)
    val byDoc = fps.groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    // compression: each doc has 8 grams (10 tokens, k=3 → 8; doc 3 has
    // 7) but strictly fewer fingerprints than grams
    assert(byDoc.values.forall(_ >= 1) && byDoc(1L) < 8 && byDoc(3L) < 7)
    val pairs = Dedup.winnowedSpanPairs(d, "doc_id", "text",
        k = 3, w = 2, minShared = 1)
      .select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "a shared >= k+w-1 span must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint vocab must not pair")

    // a doc with >= k tokens but fewer than w grams still fingerprints
    // once (the truncated-window gate)
    val short = docs((9L, "x y z")) // exactly one 3-gram, ng=1 < w=2
    assert(Dedup.winnowFingerprints(short, "doc_id", "text", 3, 2)
      .count() == 1)
  }

  test("hot-bucket cap: fires on boilerplate (pairs from it vanish), holds leave output identical") {
    // docs 1-4 share a 6-token boilerplate run (>= k+w-1 = 4, so it
    // lands a common fingerprint in ALL FOUR — df 4); docs 1 and 2
    // also share a genuine 4-token copied span (df 2).
    val boiler = "l1 l2 l3 l4 l5 l6"
    val d = docs(
      (1L, s"a1 a2 p q r s $boiler"),
      (2L, s"b1 p q r s b2 $boiler"),
      (3L, s"c1 c2 c3 c4 c5 $boiler"),
      (4L, s"e1 e2 e3 e4 e5 $boiler"))
    // HOLD: ceiling 4 >= every df — decision holds, output identical
    // to the uncapped generator
    val (heldPairs, hold) = Dedup.winnowedSpanPairsCapped(
      d, "doc_id", "text", k = 3, w = 2, minShared = 1, maxDf = 4)
    assert(!hold.capped && hold.dropped == 0 && hold.hottestDf == 4)
    val uncapped = Dedup.winnowedSpanPairs(d, "doc_id", "text", 3, 2, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(heldPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == uncapped)
    // FIRE: ceiling 3 < the boilerplate df 4 — its buckets drop, so
    // pairs that existed only through boilerplate (e.g. 3-4) vanish
    // while the genuine copied span (1-2) survives
    val (cappedPairs, fire) = Dedup.winnowedSpanPairsCapped(
      d, "doc_id", "text", k = 3, w = 2, minShared = 1, maxDf = 3)
    assert(fire.capped && fire.dropped >= 1 && fire.hottestDf == 4)
    val got = cappedPairs.select($"da", $"db").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "the genuine copied span must survive the cap")
    assert(!got.contains((3L, 4L)), "a boilerplate-only pair must be capped away")
  }

  test("capped ngram jaccard: hold is bit-identical to uncapped; fire erases boilerplate shingles from the universe") {
    val boiler = "l1 l2 l3"
    val d = docs(
      (1L, s"p q r s $boiler"),
      (2L, s"p q r s z2 $boiler"),
      (3L, s"c1 c2 c3 c4 c5 $boiler"),
      (4L, s"e1 e2 e3 e4 e5 $boiler"))
    val (held, hold) = Dedup.ngramJaccardPairsCapped(
      d, "doc_id", "text", n = 3, threshold = 0.1, maxDf = 4)
    assert(!hold.capped && hold.dropped == 0)
    val uncapped = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(held.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == uncapped)

    val (capped, fire) = Dedup.ngramJaccardPairsCapped(
      d, "doc_id", "text", n = 3, threshold = 0.1, maxDf = 3)
    assert(fire.capped && fire.dropped >= 1)
    val got = capped.select($"da", $"db").as[(Long, Long)].collect().toSet
    // 3 and 4 were similar ONLY through the shared boilerplate trigram
    // ("l1 l2 l3" — df 4 > 3): erased from the universe, they no
    // longer pair; 1 and 2 still pair on the genuine "p q r s" overlap
    assert(got.contains((1L, 2L)) && !got.contains((3L, 4L)))
  }

  test("winnowSpans: rightmost tie-break, positions point at the selected gram, value-set matches winnowFingerprints") {
    // a doc of one repeated token: every gram hashes identically, so
    // every window is an all-tie — rightmost tie-break must select the
    // LAST gram of each window, i.e. positions advance one per window
    val rep = docs((7L, "t t t t t t")) // 4 grams (k=3), w=2 → 3 windows
    val sel = Dedup.winnowSpans(rep, "doc_id", "text", k = 3, w = 2)
      .select($"spos").as[Long].collect().toSet
    assert(sel == Set(1L, 2L, 3L),
      s"all-tie windows must select their rightmost gram, got $sel")

    // on real-ish text the selected VALUES are exactly the value-only
    // fingerprints (same windows, same minima — positions added)
    val d = docs(
      (1L, "a1 a2 p q r s a3 a4 a5 a6"),
      (2L, "b1 p q r s b2 b3 b4 b5 b6"))
    val vals = Dedup.winnowSpans(d, "doc_id", "text", 3, 2)
      .select($"doc_id", $"fp").distinct()
      .as[(Long, Long)].collect().toSet
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", 3, 2)
      .as[(Long, Long)].collect().toSet
    assert(vals == fps)
    // offsets for the shared "p q r s" run: docs 1 and 2 must report
    // at least one matched offset pair, with the positions in-range
    val offs = Dedup.winnowedSpanOffsets(d, "doc_id", "text", 3, 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(offs.nonEmpty && offs.forall { case (da, db, _, pa, pb) =>
      da == 1L && db == 2L && pa >= 0 && pa < 8 && pb >= 0 && pb < 8 })
  }

  test("winnowMatchedIntervals merges diagonal runs into spans and splits distinct regions") {
    // two copied regions (12 tokens each) at DIFFERENT relative offsets
    // — distinct dot-plot diagonals — separated by unrelated middles:
    // must yield exactly two intervals, each inside its region's token
    // range in both docs; the unrelated text must contribute none.
    val run1 = (1 to 12).map(i => s"p$i").mkString(" ")
    val run2 = (1 to 12).map(i => s"f$i").mkString(" ")
    val d = docs(
      (1L, s"x1 x2 $run1 ${(1 to 10).map(i => s"a$i").mkString(" ")} $run2 x3 x4"),
      (2L, s"y1 y2 y3 $run1 ${(1 to 4).map(i => s"b$i").mkString(" ")} $run2 y4"))
    val got = Dedup.winnowMatchedIntervals(d, "doc_id", "text",
        k = 3, w = 2, maxGap = 4, minFps = 2)
      .orderBy($"a_start")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 2, s"expected one interval per copied region, got ${got.mkString(";")}")
    val Array(i1, i2) = got
    // doc1: run1 spans tokens [2, 13], run2 spans [24, 35]
    // doc2: run1 spans tokens [3, 14], run2 spans [19, 30]
    assert(i1._1 == 1L && i1._2 == 2L && i1._3 >= 2 && i1._4 <= 13 &&
      i1._5 >= 3 && i1._6 <= 14, s"run1 interval out of range: $i1")
    assert(i2._3 >= 24 && i2._4 <= 35 && i2._5 >= 19 && i2._6 <= 30,
      s"run2 interval out of range: $i2")
    // the diagonal alignment must hold inside each interval
    assert(i1._3 - i1._5 == i1._4 - i1._6 && i2._3 - i2._5 == i2._4 - i2._6)

    // single shared fingerprints (a lone k-gram coincidence) die at
    // minFps=2: a pair sharing only one 4-token run yields at most one
    // selected fingerprint per window run — below the floor
    val lone = docs(
      (3L, "c1 c2 c3 m n o q c4 c5 c6 c7 c8"),
      (4L, "d1 m n o q d2 d3 d4 d5 d6 d7 d8"))
    val loneGot = Dedup.winnowMatchedIntervals(lone, "doc_id", "text",
      k = 3, w = 2, maxGap = 4, minFps = 2).count()
    val loneRaw = Dedup.winnowMatchedIntervals(lone, "doc_id", "text",
      k = 3, w = 2, maxGap = 4, minFps = 1).count()
    assert(loneRaw >= 1, "the shared 4-token run must still match at minFps=1")
    assert(loneGot == 0, "a lone fingerprint coincidence must die at minFps=2")
  }

  test("winnowContainmentPairs scores subset-copies at 1.0 where jaccard dilutes") {
    // doc 4 is doc 3's 12-token core copied WHOLE into 24 tokens of
    // fresh text: every fingerprint of 3 appears in 4 → containment
    // 1.0, while shingle-jaccard dilutes toward ~1/3
    val core = (1 to 12).map(i => s"c$i").mkString(" ")
    val pad = (1 to 24).map(i => s"p$i").mkString(" ")
    val d = docs((3L, core), (4L, s"$pad $core"), (5L, "x1 x2 x3 x4 x5 x6 x7 x8"))
    val got = Dedup.winnowContainmentPairs(d, "doc_id", "text",
        k = 3, w = 2, minContainment = 0.9)
      .select($"da", $"db", $"containment")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._1 == 3L && got.head._2 == 4L &&
      got.head._3 == 1.0,
      s"the whole-copy must score containment 1.0 and nothing else pairs: ${got.mkString(";")}")
    val jac = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.0)
      .filter($"da" === 3L && $"db" === 4L)
      .select($"jaccard").as[Double].collect().head
    assert(jac < 0.5, s"jaccard must dilute on the subset-copy, got $jac")
  }

  test("containmentDedup drops the contained side, keeps container and bystanders") {
    val core = (1 to 12).map(i => s"c$i").mkString(" ")
    val pad = (1 to 24).map(i => s"p$i").mkString(" ")
    val d = docs((3L, core), (4L, s"$pad $core"),
      (5L, "x1 x2 x3 x4 x5 x6 x7 x8"))
    val kept = Dedup.containmentDedup(d, "doc_id", "text",
      k = 3, w = 2, minContainment = 0.9)
    assert(kept.columns.toSeq == Seq("doc_id", "text"),
      "survivors must keep every input column")
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(4L, 5L),
      "the contained core dies, the container and the bystander survive")
  }

  test("containmentDedupCapped: hold is bit-identical to uncapped; boilerplate fire keeps every doc") {
    val core = (1 to 12).map(i => s"c$i").mkString(" ")
    val pad = (1 to 24).map(i => s"p$i").mkString(" ")
    val clean = docs((3L, core), (4L, s"$pad $core"),
      (5L, "x1 x2 x3 x4 x5 x6 x7 x8"))
    // HOLD: no fingerprint over the ceiling -> output identical to the
    // uncapped method, decision says so
    val (kept, d) = Dedup.containmentDedupCapped(clean, "doc_id", "text",
      k = 3, w = 2, minContainment = 0.9, maxDf = 10)
    assert(!d.capped && d.dropped == 0)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq ==
      Dedup.containmentDedup(clean, "doc_id", "text", k = 3, w = 2,
        minContainment = 0.9).select($"doc_id").as[Long].collect().sorted.toSeq)
    // FIRE: five docs whose ONLY shared content is a license-style
    // suffix; its fingerprints hit df 5 > 4 and are erased from the
    // universe, so no containment evidence remains and every doc
    // survives — without the cap the suffix bucket's self-join would
    // pair all 10 combinations
    val boiler = (1 to 10).map(i => s"lic$i").mkString(" ")
    val hot = docs((1 to 5).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c $boiler")): _*)
    val (kept2, d2) = Dedup.containmentDedupCapped(hot, "doc_id", "text",
      k = 3, w = 2, minContainment = 0.9, maxDf = 4)
    assert(d2.capped && d2.hottestDf == 5L,
      s"the shared suffix must fire the cap: $d2")
    assert(kept2.count() == 5L,
      "with boilerplate erased, no doc is contained in another")
  }

  test("fuzzyValuePairs: typo pairs in-block, cross-block missed by contract, hot key capped") {
    val d = docs((1L, "cold bolt"), (2L, "old bolt"), (3L, "old boat"),
      (4L, "red widget"), (5L, "red widget")) // duplicate value: one vocab entry
    val (pairs, dec) = Dedup.fuzzyValuePairs(d, "text",
      v => element_at(split(v, " "), -1), maxDist = 2, maxBlock = 10)
    val got = pairs.as[(String, String, Long)].collect().toSet
    // "cold bolt"/"old bolt" pair at dist 1 inside block "bolt";
    // "old boat" is dist 1 from "old bolt" but lives in block "boat" —
    // not reported, the documented blocking recall contract
    assert(got == Set(("cold bolt", "old bolt", 1L)), s"got $got")
    assert(!dec.capped && dec.hottestDf == 2)
    // a useless blocking key (every value in one block) fires the
    // measured cap instead of going quadratic
    val (p2, dec2) = Dedup.fuzzyValuePairs(d, "text",
      _ => lit("k"), maxDist = 2, maxBlock = 3)
    assert(dec2.capped && dec2.hottestDf == 4 && p2.count() == 0)
  }

  test("fuzzyCanonicalize: transitive typo chain collapses to min, singletons self-map") {
    // "aold bolt" ~ "cold bolt" (1) and "cold bolt" ~ "old bolt" (1),
    // but "aold bolt" ~ "old bolt" is dist 1 too — the point is the
    // CLUSTER maps to one canonical even when some members pair only
    // transitively; all share block "bolt"
    val d = docs((1L, "aold bolt"), (2L, "cold bolt"), (3L, "old bolt"),
      (4L, "red widget"))
    val (m, dec) = Dedup.fuzzyCanonicalize(d, "text",
      v => element_at(split(v, " "), -1), maxDist = 1, maxBlock = 10)
    val got = m.as[(String, String)].collect().toMap
    assert(!dec.capped)
    assert(got == Map("aold bolt" -> "aold bolt", "cold bolt" -> "aold bolt",
      "old bolt" -> "aold bolt", "red widget" -> "red widget"),
      s"cluster must collapse to its lexicographic min: $got")
  }

  test("containmentDedup tie rule: identical docs keep the smaller id") {
    val core = (1 to 12).map(i => s"c$i").mkString(" ")
    val d = docs((9L, core), (7L, core))
    val kept = Dedup.containmentDedup(d, "doc_id", "text",
        k = 3, w = 2, minContainment = 0.9)
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(7L),
      s"equal fingerprint counts must drop the larger id, got $kept")
  }

  test("connected components collapse transitive near-dup chains into one group") {
    // chain 1-2-3 (1~3 never paired directly) + island 5-6 + 7-8 via 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 9L), (8L, 9L))
      .toDF("da", "db")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("verifyCandidatePairs on external candidates equals the self-join verified path") {
    // same corpus, same candidates — one path computes them in-plan
    // (lshVerifiedPairs), the other is handed them as a frame and may
    // shingle ONLY candidate docs; verdicts must agree exactly
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cand = Dedup.minhashLshPairs(d, "doc_id", "text",
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    val external = Dedup.verifyCandidatePairs(d, cand, "doc_id", "text",
        shingleN = 3, threshold = 0.8)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
    val inPlan = Dedup.lshVerifiedPairs(d, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .select("da", "db", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(external == inPlan && external.nonEmpty)
  }

  test("native simhash expression equals the relational formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val expr = Dedup.simhash32(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = Dedup.simhash32Relational(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expr.size == 500 && expr == rel)
  }

  test("simhash is identical for identical docs, differs for disjoint vocab") {
    val d = docs((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta"))
    val got = Dedup.simhash32(d, "doc_id", "text")
      .select("doc_id", "simhash32").as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    assert(got(1L) >= 0 && got(1L) < (1L << 32))
  }

  test("broadcast cosinePairs equals the declarative self-join on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fast = Similarity.cosinePairs(e, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val spec = Similarity.cosinePairsJoin(e, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast.nonEmpty && fast == spec)
  }

  test("cosine top-k ranks by hand-computed cosine") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),   // cos ≈ 0.995
      (2L, Array(0.0f, 1.0f)),   // cos = 0
      (3L, Array(0.7f, 0.7f))    // cos ≈ 0.707
    ).toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(e.filter(col("vec_id") === 0), e,
        "vec_id", "embedding", k = 2)
      .select("cid", "rk").as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 1), (3L, 2)))
  }

  test("ivf ANN: good recall vs brute force at a fraction of the scoring work") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosineTopK(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", k = 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding",
        nCentroids = 16, nProbe = 8, k = 3)
      .filter(col("qid") < 20)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall > 0.5, s"ivf recall@3 = $recall")
  }

  test("constant-folded lsh signature is bit-identical to the column-level reference formulation") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fast = e.select(col("vec_id"),
        Similarity.lshSignature(col("embedding"), 64, 8).as("sig"))
      .as[(Long, String)].collect().toMap
    val ref = e.select(col("vec_id"),
        Similarity.lshSignatureReference(col("embedding"), 64, 8).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(fast.size == 500 && fast == ref)
    assert(fast.values.forall(s => s.length == 8 && s.forall(c => c == '0' || c == '1')))
  }

  test("ANN recall floors: IVF and LSH vs brute-force ground truth at graded-query parameters") {
    // ground truth = l9's brute force; ANN variants run with the exact
    // parameters the graded l18/l20 queries use, so this pins the
    // accuracy side of their cost/recall trade-off before anyone tunes
    // nProbe/nPlanes at scale
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosineTopK(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", k = 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.filter(col("qid") < 20)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      brute.count(got.contains).toDouble / brute.size
    }
    val ivfRecall = recallOf(Similarity.ivfTopK(e, "vec_id", "embedding",
      nCentroids = 16, nProbe = 4, k = 3))
    // the graded l20 config (one 8-plane table = 256 buckets) is
    // precision-heavy by construction: on weakly-correlated synthetic
    // neighbors its recall is ~0 — reported here so the trade-off is
    // visible, not asserted
    val lshGraded = recallOf(Similarity.lshTopK(e, "vec_id", "embedding",
      dim = 64, nPlanes = 8, k = 3))
    // recall-oriented config: shorter signatures (bigger buckets) ×
    // 12 independent tables — the knobs a deployment turns for recall
    val lshRecall = recallOf(Similarity.lshTopK(e, "vec_id", "embedding",
      dim = 64, nPlanes = 3, k = 3, nTables = 12))
    info(s"recall@3 vs brute force: ivf=$ivfRecall lsh(8 planes, 1 table)=$lshGraded " +
      s"lsh(3 planes, 12 tables)=$lshRecall")
    assert(ivfRecall >= 0.8, s"ivf recall@3 = $ivfRecall")
    assert(lshRecall >= 0.8, s"multi-table lsh recall@3 = $lshRecall")
  }

  test("l2Normalize yields unit vectors; zero vectors pass through unpoisoned") {
    val e = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = e.select(col("vec_id"), Similarity.l2Normalize(col("embedding")).as("nv"))
      .as[(Long, Array[Float])].collect().toMap
    assert(got(1L).toSeq == Seq(0.6f, 0.8f))
    assert(got(2L).toSeq == Seq(0.0f, 0.0f))
  }

  test("meanPool: layout-invariant pooled vectors matching a driver-side exact reference") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pool(df: org.apache.spark.sql.DataFrame) =
      Similarity.meanPool(df, "label", "embedding")
        .as[(Long, Array[Float], Long)].collect()
        .map(r => r._1 -> ((r._2.toSeq, r._3))).toMap
    val a = pool(e)
    val b = pool(e.repartition(17))
    assert(a == b && a.nonEmpty) // decimal sums: identical under any layout
    // exact reference: BigDecimal accumulation per (label, dim) on the driver
    val rows = e.select(col("label").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    rows.groupBy(_._1).foreach { case (label, vs) =>
      val dim = vs.head._2.length
      val expect = (0 until dim).map { d =>
        val s = vs.map(v => java.math.BigDecimal.valueOf(v._2(d).toDouble))
          .reduce(_.add(_))
        (s.doubleValue() / vs.length).toFloat
      }
      assert(a(label)._1 == expect && a(label)._2 == vs.length)
    }
  }

  test("kmeans quantizer: layout-invariant centroids, recall at least matches the prefix init") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c1 = Similarity.kmeans(e, "vec_id", "embedding", k = 16, iters = 3)
    val c2 = Similarity.kmeans(e.repartition(13), "vec_id", "embedding", k = 16, iters = 3)
    // decimal-sum updates + rounded assignments: same centroids bit for
    // bit under any input layout (double-sum means would drift)
    assert(c1.length == 16 && c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)

    val brute = Similarity.cosineTopK(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", k = 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    def recallOf(iters: Int): Double = {
      val got = Similarity.ivfTopK(e, "vec_id", "embedding",
          nCentroids = 16, nProbe = 4, k = 3, kmeansIters = iters)
        .filter(col("qid") < 20)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      brute.count(got.contains).toDouble / brute.size
    }
    val prefix = recallOf(0)
    val trained = recallOf(3)
    info(s"ivf recall@3: prefix-init=$prefix kmeans-3=$trained")
    assert(trained >= 0.8 && trained >= prefix - 0.05)
  }

  test("lsh cosine pairs: exact precision (subset of brute-force pairs) with measured recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosinePairs(e, "vec_id", "embedding", 0.4)
      .select("da", "db", "cos").as[(Long, Long, Double)].collect().toSet
    // graded l22 config: cost-leaning, recall reported not asserted
    val graded = Similarity.lshCosinePairs(e, "vec_id", "embedding",
        dim = 64, nPlanes = 4, nTables = 6, threshold = 0.4)
      .select("da", "db", "cos").as[(Long, Long, Double)].collect().toSet
    // recall-leaning config: bigger buckets × more tables
    val recallCfg = Similarity.lshCosinePairs(e, "vec_id", "embedding",
        dim = 64, nPlanes = 3, nTables = 10, threshold = 0.4)
      .select("da", "db", "cos").as[(Long, Long, Double)].collect().toSet
    assert(graded.nonEmpty && graded.subsetOf(brute)) // precision is exact
    assert(recallCfg.subsetOf(brute))
    val gRecall = brute.count(graded.contains).toDouble / brute.size
    val rRecall = brute.count(recallCfg.contains).toDouble / brute.size
    info(s"lsh pair recall vs brute force at 0.4: 4p×6t=$gRecall 3p×10t=$rRecall")
    assert(rRecall >= 0.8, s"pair recall = $rRecall")
  }

  test("lsh buckets: identical vectors always co-bucket and rank first") {
    val e = Seq(
      (0L, Array.fill(4)(0.5f)),
      (1L, Array.fill(4)(0.5f)),
      (2L, Array(0.9f, -0.8f, 0.1f, -0.2f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(e, "vec_id", "embedding", dim = 4, nPlanes = 4, k = 1)
      .select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
    val m = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(m.get(0L).map(_._1).contains(1L) && m(0L)._2 == 1.0)
    assert(m.get(1L).map(_._1).contains(0L))
  }

  test("keepBestPerGroup keeps the quality argmax per cluster, singletons keep themselves") {
    val d = docs((1L, "low"), (2L, "best"), (3L, "mid"), (4L, "alone"))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("da", "db")
    val score = when(col("text") === "best", 0.9)
      .when(col("text") === "mid", 0.5).otherwise(0.1)
    val got = Dedup.keepBestPerGroup(d, pairs, "doc_id", score)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((2L, 0)), 2L -> ((2L, 1)), 3L -> ((2L, 0)), 4L -> ((4L, 1))))
  }

  test("keepBestPerGroup tiebreaks equal scores on the lower id") {
    val d = docs((7L, "same"), (5L, "same"), (6L, "same"))
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("da", "db")
    val got = Dedup.keepBestPerGroup(d, pairs, "doc_id", lit(1.0))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(got.values.toSet == Set(5L))
  }

  test("zero-norm vectors score cosine 0 everywhere — never NaN-poison pairs or rankings") {
    val unit = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val emb = Seq(
      (1L, Array.fill(64)(0.0f)), // failed-encoder sentinel
      (2L, unit),
      (3L, unit.clone()))
      .toDF("vec_id", "embedding")
    // pair finders: only the genuine duplicate surfaces; nothing is NaN
    for (pairs <- Seq(
      Similarity.cosinePairs(emb, "vec_id", "embedding", 0.5),
      Similarity.lshCosinePairs(emb, "vec_id", "embedding", 64, 2, 4, 0.5))) {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.forall(!_._3.isNaN), s"NaN cosine leaked: ${got.mkString(",")}")
      assert(got.map(p => (p._1, p._2)).toSet == Set((2L, 3L)))
    }
    // rankers: the zero vector is never the NaN-ranked top neighbor
    for (topk <- Seq(
      Similarity.lshTopK(emb, "vec_id", "embedding", 64, 2, 1, 4),
      Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 2, nProbe = 2, k = 1))) {
      val top = topk.select("qid", "cid", "cos").as[(Long, Long, Double)].collect()
      assert(top.forall(!_._3.isNaN))
      top.filter(t => t._1 == 2L).foreach { case (_, cid, cos) =>
        assert(cid == 3L && cos == 1.0, s"zero vector outranked the true duplicate: $cid/$cos")
      }
    }
  }

  test("LSH tuner: S-curve thresholds drive (bands, rows); ties break toward recall") {
    // H=8 divisor thresholds: r=1 -> 0.125, r=2 -> (1/4)^(1/2) = 0.5
    // exactly, r=4 -> (1/2)^(1/4) ~ 0.841, r=8 -> 1.0
    assert(Dedup.tuneRowsPerBand(8, 0.5) == 2)
    assert(Dedup.tuneRowsPerBand(8, 0.1) == 1)
    assert(Dedup.tuneRowsPerBand(8, 0.9) == 4)  // |0.841-0.9| < |1.0-0.9|
    assert(Dedup.tuneRowsPerBand(8, 1.0) == 8)
    // equidistant between r=1 (0.125) and r=2 (0.5): prefer smaller r
    // (more bands, higher recall — downstream verification removes FPs)
    assert(Dedup.tuneRowsPerBand(8, 0.3125) == 1)
    // the S-curve itself: steeper and centered near the threshold
    val atThreshold = Dedup.lshCollisionProb(8, 2, 0.5)
    assert(atThreshold > 0.6 && atThreshold < 0.8) // 1-(1-0.25)^4 ~ 0.684
    assert(Dedup.lshCollisionProb(8, 2, 0.9) > 0.99)
    assert(Dedup.lshCollisionProb(8, 2, 0.1) < 0.05)
    intercept[IllegalArgumentException](Dedup.tuneRowsPerBand(0, 0.5))
    intercept[IllegalArgumentException](Dedup.tuneRowsPerBand(8, 0.0))
  }

  test("qgramSet: distinct character q-grams; sub-q values carry none") {
    val d = docs((1L, "abcab"), (2L, "ab"))
    val got = d.select($"doc_id", Dedup.qgramSet($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).toSet == Set("abc", "bca", "cab") && got(1L).size == 3)
    assert(got(2L).isEmpty)
    intercept[IllegalArgumentException](Dedup.qgramSet($"text", 1))
  }

  test("fuzzyValuePairsMultiBlockSets: q-gram key pairs one-token typos word keys can never block; hot grams cap") {
    val d = Seq("widget", "widge", "anvil", "navil", "zzz")
      .toDF("v")
    val keys: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Seq(v => array(element_at(split(v, " "), -1)), v => Dedup.qgramSet(v, 3))
    val (pairs, ds) = Dedup.fuzzyValuePairsMultiBlockSets(d, "v",
      keys, maxDist = 2, maxBlock = 10)
    assert(ds.size == 2 && ds.forall(!_.capped))
    val got = pairs.as[(String, String, Long)].collect().toSet
    // "anvil"/"navil" share gram "vil" (transposition = 2 edits);
    // "widge" is a strict prefix of "widget" (1 deletion) — found only
    // through the q-gram key, since one-token identity blocks never
    // hold two distinct values
    assert(got == Set(("anvil", "navil", 2L), ("widge", "widget", 1L)))
    val (wordOnly, _) = Dedup.fuzzyValuePairsMultiBlockSets(d, "v",
      keys.take(1), maxDist = 2, maxBlock = 10)
    assert(wordOnly.isEmpty,
      "identity blocking on one-token values must pair nothing")
    // maxBlock = 1 drops every shared gram (df >= 2 > 1) — the cap
    // fires and no pair survives: boilerplate-gram semantics
    val (capped, ds2) = Dedup.fuzzyValuePairsMultiBlockSets(d, "v",
      keys, maxDist = 2, maxBlock = 1)
    assert(ds2.last.capped && capped.isEmpty)
  }

  test("fuzzyCanonicalizeMultiBlockSets: one-token typo chain collapses through q-gram blocks; isolates self-map") {
    // "widge" ~ "widget" (deletion) and "widget" ~ "widgex" (subst):
    // a chain only the q-gram key can see on one-token values; the
    // closure must collapse all three to the lexicographic min, and
    // the unpaired value maps to itself
    val d = Seq("widget", "widge", "widgex", "zzz").toDF("v")
    val keys: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Seq(v => array(element_at(split(v, " "), -1)), v => Dedup.qgramSet(v, 3))
    val (m, ds) = Dedup.fuzzyCanonicalizeMultiBlockSets(d, "v",
      keys, maxDist = 2, maxBlock = 10)
    assert(ds.forall(!_.capped))
    val got = m.as[(String, String)].collect().toMap
    assert(got == Map("widget" -> "widge", "widge" -> "widge",
      "widgex" -> "widge", "zzz" -> "zzz"))
  }

  test("byteJaccardPairs equals hand-checked byte-window Jaccard") {
    val d = Seq((1L, "abcdefgh"), (2L, "abcdefgx"), (3L, "qrstuvwx"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    // 4-byte windows: docs 1 and 2 share {abcd,bcde,cdef,defg} of a
    // 6-element union -> J = 2/3; doc 3 is disjoint from both
    val got = Dedup.byteJaccardPairs(d, "doc_id", "payload", n = 4,
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 2.0 / 3.0)))
  }

  test("byteNearDupPairsStratified: superset of the base banding, exact on fine pairs, identical when no doc is short") {
    val r = new scala.util.Random(11)
    def doc(len: Int): String =
      Array.fill(len)((97 + r.nextInt(26)).toChar).mkString
    // short near-dup pair (one char changed in 100 bytes: 8 of 93
    // windows move, J ~ 0.84) + long docs: the pair algebra puts both
    // shorts in the fine universe at shortMaxShingles = 100
    val shortA = doc(100)
    val shortB = shortA.updated(50, if (shortA(50) == 'z') 'y' else 'z')
    val longs = (0 until 4).map(i => (10L + i, doc(400)))
    val d = (Seq((1L, shortA), (2L, shortB)) ++ longs)
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val exact = Dedup.byteJaccardPairs(d, "doc_id", "payload", n = 8,
      threshold = 0.7).select("da", "db").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 2L)))
    val (base, _) = Dedup.byteNearDupPairs(d, "doc_id", "payload",
      n = 8, numHashes = 16, rowsPerBand = 4, threshold = 0.7,
      maxDf = Long.MaxValue)
    val (strat, _) = Dedup.byteNearDupPairsStratified(d, "doc_id", "payload",
      n = 8, numHashes = 16, rowsPerBand = 4, shortRowsPerBand = 2,
      shortMaxShingles = 100, threshold = 0.7, maxDf = Long.MaxValue)
    val baseSet = base.select("da", "db").as[(Long, Long)].collect().toSet
    val stratSet = strat.select("da", "db").as[(Long, Long)].collect().toSet
    assert(baseSet.subsetOf(stratSet),
      s"stratified banding must never lose a base pair: ${baseSet -- stratSet}")
    assert(stratSet.contains((1L, 2L)),
      "the fine banding must recover the short near-dup pair")
    assert(stratSet.subsetOf(exact),
      "every stratified pair still passes the exact verification")
    // cut 0 disables the fine leg -> bit-identical to the base plan
    val (off, _) = Dedup.byteNearDupPairsStratified(d, "doc_id", "payload",
      n = 8, numHashes = 16, rowsPerBand = 4, shortRowsPerBand = 2,
      shortMaxShingles = 1, threshold = 0.7, maxDf = Long.MaxValue)
    assert(off.select("da", "db").as[(Long, Long)].collect().toSet == baseSet,
      "with no doc under the cut the stratified form must equal the base form")
  }

  test("byteShingleSet: per-doc distinct UPPERCASE hex n-grams, row-local dedup included") {
    // the row-local array_distinct + bare hex() form must equal the
    // reference semantics the old global-distinct + upper() form had:
    // distinct per-doc windows, uppercase rendering — exercised with
    // repeated windows (dedup) and high-bit bytes (where lowercase hex
    // would diverge)
    val d = Seq(
      1L -> Array[Byte](1, 2, 3, 1, 2, 3, 1, 2, 3), // repeats: windows dedup
      2L -> Array[Byte](0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte),
      3L -> Array[Byte](7, 8) // shorter than n: contributes nothing
    ).toDF("doc_id", "payload")
    val got = Dedup.byteShingleSet(d, "doc_id", "payload", n = 3)
      .as[(Long, String)].collect().toSet
    def ref(bytes: Array[Byte], n: Int): Set[String] =
      bytes.sliding(n).filter(_.length == n)
        .map(_.map(b => f"${b & 0xff}%02X").mkString).toSet
    val want = Set(1L -> Array[Byte](1, 2, 3, 1, 2, 3, 1, 2, 3),
      2L -> Array[Byte](0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte))
      .flatMap { case (id, b) => ref(b, 3).map(id -> _) }
    assert(got == want,
      s"byte shingles diverge from the reference: extra=${got -- want}, missing=${want -- got}")
    assert(got.forall(_._2.forall(c => c.isDigit || (c >= 'A' && c <= 'F'))),
      "hex rendering must stay uppercase (the engine-portable contract)")
  }
}
