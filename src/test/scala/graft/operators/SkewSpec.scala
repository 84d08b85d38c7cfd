package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 10k rows on one hot key + scattered cold keys
    val hot = (1 to 10000).map(i => ("hot", i.toLong))
    val cold = (1 to 100).map(i => (s"k$i", i.toLong))
    val df = (hot ++ cold).toDF("key", "v")
    val direct = df.groupBy("key").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, Seq("key"), "v", nSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join returns exactly the plain-join rows") {
    val left = ((1 to 1000).map(i => ("hot", i)) ++ Seq(("a", 1), ("b", 2), ("miss", 3))).toDF("lk", "lv")
    val right = Seq(("hot", 10), ("a", 20), ("b", 30), ("only_right", 40)).toDF("rk", "rv")
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lk", "lv", "rv").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val salted = Skew.saltedJoin(left, right, "lk", "rk", nSalts = 4)
      .select("lk", "lv", "rv").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 1000)
  }

  test("hotKeyShare measures the hottest key's fraction, deterministically on any layout") {
    // 600 'hot' rows + 400 spread over 40 cold keys → share 0.6 exactly
    val df = ((1 to 600).map(_ => "hot") ++ (1 to 400).map(i => s"k${i % 40}"))
      .toDF("key").withColumn("v", lit(1L))
    Seq(df, df.repartition(13)).foreach { d =>
      val (share, key, total) = Skew.hotKeyShare(d, Seq("key"))
      assert(math.abs(share - 0.6) < 1e-12)
      assert(key == "key=hot")
      assert(total == 1000)
    }
    // empty input: share 0, no crash
    val (s0, _, t0) = Skew.hotKeyShare(df.filter(lit(false)), Seq("key"))
    assert(s0 == 0.0 && t0 == 0L)
  }

  test("autoSaltedSumCount pins the decision both ways around the threshold, values identical") {
    val df = ((1 to 600).map(i => ("hot", i.toLong)) ++
      (1 to 400).map(i => (s"k${i % 40}", i.toLong))).toDF("key", "v")
    val direct = df.groupBy("key").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    val expect = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // share 0.6 ≥ 0.5 → salted
    val (salted, d1) = Skew.autoSaltedSumCount(df, Seq("key"), "v", nSalts = 8, threshold = 0.5)
    assert(d1.salted && math.abs(d1.topShare - 0.6) < 1e-12 && d1.topKey == "key=hot")
    assert(salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == expect)

    // share 0.6 < 0.7 → plain
    val (plain, d2) = Skew.autoSaltedSumCount(df, Seq("key"), "v", nSalts = 8, threshold = 0.7)
    assert(!d2.salted && math.abs(d2.topShare - 0.6) < 1e-12)
    assert(plain.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == expect)

    // output (name, type) identical on BOTH branches (the salted re-agg
    // is cast back), including for decimal sums whose re-agg would
    // otherwise widen precision; nullability metadata may differ
    // (sum-of-counts is nullable where count is not) and carries no
    // value difference
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(salted) == shape(plain))
    val dec = df.withColumn("v", col("v").cast("decimal(18,2)"))
    val (sDec, _) = Skew.autoSaltedSumCount(dec, Seq("key"), "v", threshold = 0.5)
    val (pDec, _) = Skew.autoSaltedSumCount(dec, Seq("key"), "v", threshold = 0.7)
    assert(shape(sDec) == shape(pDec))
  }

  test("autoSaltedJoin pins the decision both ways, rows identical") {
    val left = ((1 to 600).map(i => ("hot", i)) ++
      (1 to 400).map(i => (s"k${i % 40}", i))).toDF("lk", "lv")
    val right = Seq(("hot", 10), ("k1", 20), ("k2", 30), ("only_right", 40)).toDF("rk", "rv")
    val expect = left.join(right, col("lk") === col("rk"))
      .select("lk", "lv", "rv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet

    val (salted, d1) = Skew.autoSaltedJoin(left, right, "lk", "rk", nSalts = 4, threshold = 0.5)
    assert(d1.salted)
    assert(salted.select("lk", "lv", "rv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet == expect)

    val (plain, d2) = Skew.autoSaltedJoin(left, right, "lk", "rk", nSalts = 4, threshold = 0.7)
    assert(!d2.salted)
    assert(plain.select("lk", "lv", "rv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet == expect)
  }

  test("reserved scratch columns fail loudly instead of silently overwriting user data") {
    val df = Seq(("k", 1L)).toDF("key", "v")
    val ex1 = intercept[IllegalArgumentException](
      Skew.saltedSumCount(df.withColumn("_salt", lit(9)), Seq("key"), "v", 4))
    assert(ex1.getMessage.contains("_salt"))
    // the post-join drop is name-based on the combined frame, so BOTH
    // names are reserved on BOTH sides
    val right = Seq(("k", 2L)).toDF("rk", "rv")
    val ex2 = intercept[IllegalArgumentException](
      Skew.saltedJoin(df.withColumn("_rsalt", lit(9)), right, "key", "rk", 4))
    assert(ex2.getMessage.contains("_rsalt"))
    val ex3 = intercept[IllegalArgumentException](
      Skew.saltedJoin(df, right.withColumn("_lsalt", lit(9)), "key", "rk", 4))
    assert(ex3.getMessage.contains("_lsalt"))
  }
}
