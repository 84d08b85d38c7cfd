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
}
