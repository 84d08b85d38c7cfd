package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sampling membership is a pure function of (salt, id): layout-invariant, rerun-stable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Sampling.sample(docs, "doc_id", 0.5, "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.sample(docs.repartition(13), "doc_id", 0.5, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty) // df.sample() fails exactly this property
    // different salt → a different (independent) subset
    val c = Sampling.sample(docs, "doc_id", 0.5, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c)
    // rate is honored within binomial noise (n=500, p=0.5 → σ≈11)
    assert(math.abs(a.size - 250) < 60, s"kept ${a.size} of 500 at rate 0.5")
  }

  test("toTargetMix: kept corpus matches the target mix in expectation, deterministically") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val targets = Map("en" -> 0.4, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.15, "zh" -> 0.15)
    val kept = Sampling.toTargetMix(docs, "lang", "doc_id", targets, "mixspec")
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = byLang.values.sum.toDouble
    // every named stratum survives and its share is near the target
    // (n≈350 kept → binomial σ on a 0.15 share ≈ 0.02)
    targets.foreach { case (l, w) =>
      val share = byLang.getOrElse(l, 0L) / total
      assert(math.abs(share - w) < 0.07, s"$l share $share vs target $w")
    }
    // downsample-only: no stratum exceeds its original count
    val orig = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    byLang.foreach { case (l, n) => assert(n <= orig(l)) }
    // layout-invariant: same rows under a different partitioning
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Sampling.toTargetMix(docs.repartition(17), "lang", "doc_id", targets, "mixspec")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("toTargetMix: unnamed strata are dropped; the binding stratum keeps ~all rows") {
    val df = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")).toDF("id", "s")
    // a and b both have 100 rows; targets 0.2/0.8 → b binds (100/0.8=125
    // < 100/0.2=500), so b keeps ~all 100 and a keeps ~25; c vanishes
    val kept = Sampling.toTargetMix(df, "s", "id", Map("a" -> 0.2, "b" -> 0.8), "t")
    val byS = kept.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(!byS.contains("c"))
    assert(byS("b") >= 95, s"binding stratum kept ${byS("b")}/100")
    assert(byS("a") >= 10 && byS("a") <= 45, s"a kept ${byS("a")} vs expected ~25")
  }

  test("stratified rates apply per stratum; unnamed strata keep the default") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratified(docs, "lang", "doc_id",
        rates = Map("en" -> 0.3), salt = "curate42")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // non-en strata survive in full (default rate 1.0)
    byLang.keys.filterNot(_ == "en").foreach(l => assert(sampled(l) == byLang(l)))
    // en is downsampled to ~30% (n≈218, p=0.3 → σ≈7)
    val en = sampled("en").toDouble / byLang("en")
    assert(en > 0.15 && en < 0.45, s"en keep-rate $en")
    // rate 0 removes a stratum entirely; rates outside [0,1] are rejected
    val none = Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 0.0), "s")
      .filter(col("lang") === "en").count()
    assert(none == 0L)
    intercept[IllegalArgumentException] {
      Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 1.5), "s")
    }
  }

  test("samples nest: rate r1 <= r2 with the same salt implies subset membership") {
    // the unit-hash coin is fixed per (salt, id), so growing the rate
    // only ADDS rows — scaling a training subset up never churns the
    // rows already selected (df.sample() re-draws everything)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r3 = Sampling.sample(docs, "doc_id", 0.3, "grow").select("doc_id").as[Long].collect().toSet
    val r6 = Sampling.sample(docs, "doc_id", 0.6, "grow").select("doc_id").as[Long].collect().toSet
    val r9 = Sampling.sample(docs, "doc_id", 0.9, "grow").select("doc_id").as[Long].collect().toSet
    assert(r3.subsetOf(r6) && r6.subsetOf(r9))
    assert(r3.size < r6.size && r6.size < r9.size)
  }

  test("toTargetMix raises on a target stratum absent from the corpus") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "s")
    val mixed = Sampling.toTargetMix(df, "s", "id",
      Map("a" -> 0.5, "b" -> 0.3, "zz" -> 0.2), "salt")
    val e = intercept[Exception](mixed.count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("absent from the corpus")),
      s"expected the absent-stratum error, got: ${e.getMessage}")
  }

  test("null ids are sampled on a shared coin, never silently dropped at rate 1.0") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (null, "c"))
      .toDF("doc_id", "v")
    assert(Sampling.sample(df, "doc_id", 1.0, "s").count() == 3)
    assert(Sampling.sample(df, "doc_id", 0.0, "s").count() == 0)
  }

  test("temperatureMix: α=1 is identity, the smallest stratum always survives whole, α tempers the head") {
    // head 1600 / mid 400 / tail 100
    val docs = spark.range(2100).select(col("id"),
      when(col("id") < 1600, "head").when(col("id") < 2000, "mid").otherwise("tail").as("s"))
    // α = 1: natural mix — every rate is (nmin/ns)^0 = 1, nothing drops
    assert(Sampling.temperatureMix(docs, "s", "id", 1.0, "tm").count() == 2100)
    // α = 0.5: the smallest stratum keeps rate 1 EXACTLY (sqrt(1)),
    // the head keeps sqrt(100/1600) = 1/4 in expectation
    val kept = Sampling.temperatureMix(docs, "s", "id", 0.5, "tm")
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(kept("tail") == 100, "the smallest stratum must keep every row")
    // binomial(1600, 0.25): σ≈17.3 — 6σ window
    assert(math.abs(kept("head") - 400) < 104, s"head kept ${kept("head")}, expected ≈400")
    // deterministic across layouts
    val re = Sampling.temperatureMix(docs.repartition(13), "s", "id", 0.5, "tm")
      .select("id").as[Long].collect().toSet
    assert(re == Sampling.temperatureMix(docs, "s", "id", 0.5, "tm")
      .select("id").as[Long].collect().toSet)
    // α = 0 equalizes expected counts: every stratum's expectation is
    // n_tail = 100 (binomial noise aside)
    val eq = Sampling.temperatureMix(docs, "s", "id", 0.0, "tm2")
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(eq("tail") == 100)
    assert(math.abs(eq("head") - 100) < 60 && math.abs(eq("mid") - 100) < 60, s"$eq")
  }

  test("weightedByScore: max-weight rows kept EXACTLY (p=1), light rows ∝ weight, layout-invariant") {
    // 500 light (w=200) + 500 heavy (w=1000): p = 0.2 / 1.0
    val docs = spark.range(1000)
      .select(col("id"), when(col("id") < 500, 200L).otherwise(1000L).as("w"))
    val kept = Sampling.weightedByScore(docs, "id", "w", "ws")
      .select("id").as[Long].collect().toSet
    // p=1 is exact, not probabilistic: uh·maxW < maxW·2^32 ⟺ uh < 2^32,
    // true for every 32-bit hash — no max-weight row can ever be dropped
    assert((500L until 1000L).forall(kept.contains), "a max-weight row was dropped")
    val light = kept.count(_ < 500)
    // binomial(500, 0.2): σ≈8.9 — a 6σ window
    assert(math.abs(light - 100) < 54, s"kept $light of 500 light rows at p=0.2")
    // membership is a pure function of (salt, id, weights): layout-invariant
    val kept13 = Sampling.weightedByScore(docs.repartition(13), "id", "w", "ws")
      .select("id").as[Long].collect().toSet
    assert(kept == kept13)
  }

  test("exactKPerStratum: exactly min(k, n) rows, identical to the naive one-window selection") {
    import org.apache.spark.sql.expressions.Window
    // 3 strata: big (600), exact-k (5), small (2)
    val docs = spark.range(607).select(col("id"),
      when(col("id") < 600, "big").when(col("id") < 605, "mid").otherwise("tiny").as("s"))
    val k = 5
    val got = Sampling.exactKPerStratum(docs, "s", "id", k, "xk")
      .select("s", "id").as[(String, Long)].collect()
    val counts = got.groupBy(_._1).map { case (s, r) => (s, r.length) }
    assert(counts == Map("big" -> 5, "mid" -> 5, "tiny" -> 2))
    // the two-phase prune selects the IDENTICAL rows as the naive
    // single-task window it exists to avoid
    val h = md5(concat(lit("xk|"), col("id").cast("string")))
    val naive = docs.withColumn("_rn",
        row_number().over(Window.partitionBy(col("s")).orderBy(h, col("id"))))
      .filter(col("_rn") <= k).select("s", "id").as[(String, Long)].collect()
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    // layout-invariant: fewer/more scan partitions change phase-1
    // pruning groups but never the selection
    Seq(1, 13).foreach { p =>
      val re = Sampling.exactKPerStratum(docs.repartition(p), "s", "id", k, "xk")
        .select("s", "id").as[(String, Long)].collect()
      assert(re.sorted.toSeq == got.sorted.toSeq, s"selection drifted at $p partitions")
    }
  }

  test("weightedByScore fails loudly on negative weights instead of silently never sampling them") {
    val df = Seq((1L, 10L), (2L, -3L)).toDF("id", "w")
    val e = intercept[Exception](Sampling.weightedByScore(df, "id", "w", "s").count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null/negative weight")))
  }

  test("reserved scratch column names fail loudly instead of silently clobbering") {
    val df = Seq((1L, "en", 10L)).toDF("id", "lang", "w")
    def msg(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(Sampling.toTargetMix(df.withColumn("rate", lit(0)), "lang", "id",
      Map("en" -> 1.0), "s")).contains("rate"))
    assert(msg(Sampling.exactKPerStratum(df.withColumn("_h", lit(0)), "lang", "id", 1, "s"))
      .contains("_h"))
    assert(msg(Sampling.temperatureMix(df.withColumn("_rate", lit(0)), "lang", "id", 0.5, "s"))
      .contains("_rate"))
    assert(msg(Sampling.weightedByScore(df.withColumn("_maxw", lit(0)), "id", "w", "s"))
      .contains("_maxw"))
  }

  test("repeatByFactor: stochastic rounding on the md5 coin, dense copies, layout-invariant") {
    val df = spark.range(2000).toDF("id")
    // integer factor: exact replication with dense copy indices
    val twice = Sampling.repeatByFactor(df, "id", lit(2.0), "rep-spec")
    assert(twice.count() == 4000)
    assert(twice.groupBy("id").count().filter(col("count") =!= 2).count() == 0)
    assert(twice.select("copy").distinct().as[Int].collect().toSet == Set(0, 1))
    // fractional factor 1.5: every id gets 1 or 2 copies, ~half get 2,
    // and membership is the deterministic coin — layout cannot move it
    val frac = Sampling.repeatByFactor(df, "id", lit(1.5), "rep-spec")
    val perId = frac.groupBy("id").count().select("id", "count")
      .as[(Long, Long)].collect().toMap
    assert(perId.values.forall(k => k == 1 || k == 2))
    val doubled = perId.count(_._2 == 2)
    assert(doubled > 850 && doubled < 1150, s"expected ~1000 doubled ids, got $doubled")
    val re = Sampling.repeatByFactor(df.repartition(13), "id", lit(1.5), "rep-spec")
      .groupBy("id").count().select("id", "count").as[(Long, Long)].collect().toMap
    assert(re == perId)
    // f < 1 downsamples through the same formula
    val down = Sampling.repeatByFactor(df, "id", lit(0.25), "rep-spec").count()
    assert(down > 350 && down < 650, s"expected ~500 at f=0.25, got $down")
    // corrupt factors fail loudly — negative, NaN (which passes every
    // < comparison and would silently DROP the row via a null k), and
    // absurd magnitudes alike
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    for (bad <- Seq(lit(-1.0), lit(Double.NaN), lit(2e6))) {
      val e = intercept[Exception](
        Sampling.repeatByFactor(df, "id", bad, "rep-spec").count())
      assert(messages(e).exists(_.contains("absurd factor")), s"factor $bad not rejected")
    }
  }
}
