package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish corpus: key k_i appears ~1000/i times — a known frequency
  // table the sketch path must reproduce exactly.
  private def zipf = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
    .toDF("key").repartition(11)

  test("misraGriesCandidates is a superset of every key with freq > N/m") {
    val df = zipf
    val n = df.count()
    val m = 16
    val cand = Frequency.misraGriesCandidates(df, "key", m)
      .collect().map(_.get(0)).toSet
    val mustSurvive = df.groupBy("key").count()
      .filter(col("count") > n / m)
      .collect().map(_.get(0)).toSet
    assert(mustSurvive.subsetOf(cand),
      s"missing guaranteed heavy hitters: ${mustSurvive -- cand}")
  }

  test("mgFold: bounded at m, chunked fold == one fold, superset bound holds on adversarial order") {
    // the w15 streaming contract in miniature: a long tail adversarially
    // INTERLEAVED with a heavy key (worst case for decrement pressure)
    val heavy = "H"
    val stream = (1 to 400).flatMap(i => Seq(s"t$i", heavy)) // 400 tail + 400 heavy
    val m = 8
    val fold1 = stream.foldLeft(Map.empty[String, Long])(Frequency.mgFold(_, _, m))
    // never more than m counters at ANY prefix (state-store bound)
    stream.scanLeft(Map.empty[String, Long])(Frequency.mgFold(_, _, m))
      .foreach(s => assert(s.size <= m, s"summary exceeded m: ${s.size}"))
    // micro-batch merge = sequential insertion over the concatenation:
    // folding the same stream in 4 chunks must land on the same summary
    val fold4 = stream.grouped(200).foldLeft(Map.empty[String, Long]) {
      (acc, chunk) => chunk.foldLeft(acc)(Frequency.mgFold(_, _, m))
    }
    assert(fold1 == fold4, "chunked fold diverged from the one-shot fold")
    // the MG guarantee: any key with freq > n/m survives; here
    // freq(H)=400 > 800/8=100, so H must be present — and every
    // ABSENT key's true frequency must be <= n/m
    assert(fold1.contains(heavy), s"heavy key evicted: $fold1")
    val trueFreq = stream.groupBy(identity).view.mapValues(_.size.toLong)
    stream.distinct.filterNot(fold1.contains).foreach { k =>
      assert(trueFreq(k) <= stream.size / m,
        s"absent key $k has freq ${trueFreq(k)} > n/m")
    }
  }

  test("sketched heavy hitters equal the exact groupBy, on any layout") {
    val df = zipf
    val exact = df.groupBy("key").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    Seq(df, df.repartition(3), df.coalesce(1)).foreach { d =>
      val (out, dec) = Frequency.heavyHitters(d, "key", minFreq = 50)
      assert(dec.sketched, s"expected the sketch path to fire: $dec")
      val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == exact)
    }
  }

  test("counter budget above maxCounters dispatches to the exact path, same rows") {
    val df = zipf
    val exact = df.groupBy("key").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val (out, dec) = Frequency.heavyHitters(df, "key", minFreq = 2, maxCounters = 64)
    assert(!dec.sketched && dec.counters == 0,
      s"budget ${dec.totalRows / 2 + 1} must exceed 64 and hold: $dec")
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact)
  }

  test("null keys are excluded; knownTotal skips the recount without changing rows") {
    val df = (Seq.fill(40)(Some("a")) ++ Seq.fill(5)(Some("b")) ++ Seq.fill(7)(None))
      .toDF("key")
    val n = df.where(col("key").isNotNull).count()
    val (out, dec) = Frequency.heavyHitters(df, "key", minFreq = 10, knownTotal = Some(n))
    assert(dec.totalRows == 45 && dec.sketched)
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 40L)))
  }

  test("non-string key types survive the candidate round-trip") {
    val df = (1 to 30).flatMap(i => Seq.fill(if (i == 7) 100 else 2)(i.toLong))
      .toDF("key").repartition(5)
    val (out, dec) = Frequency.heavyHitters(df, "key", minFreq = 50)
    assert(dec.sketched)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 100L)))
  }
}
