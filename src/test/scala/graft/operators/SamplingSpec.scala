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

  test("null ids are sampled on a shared coin, never silently dropped at rate 1.0") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (null, "c"))
      .toDF("doc_id", "v")
    assert(Sampling.sample(df, "doc_id", 1.0, "s").count() == 3)
    assert(Sampling.sample(df, "doc_id", 0.0, "s").count() == 0)
  }
}
