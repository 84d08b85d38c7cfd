package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-location must actually eliminate the exchange — the
  * point of paying the bucketed write — and must not change results.
  * Asserted on the executed physical plan, not on folklore. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Multiplicity-preserving result snapshot: joins legitimately emit
    * duplicate rows, so a Set compare would let a dropped-or-doubled
    * match regress silently. */
  private def rowCounts(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity).map { case (r, g) => r -> g.size }

  test("equi-join of two same-bucketed tables is exchange-free and result-identical") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "bkt_lineitem", "o_orderkey", 8)
    try {
      // force the sort-merge path: a broadcast join has no exchange to
      // eliminate and would vacuously pass
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val bucketed = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_lineitem", "o_orderkey",
            forceSortMerge = true)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        // the join itself must run WITHOUT a shuffle on either side;
        // the groupBy on the same key rides the same distribution, so
        // the whole plan is exchange-free
        assert(Bucketing.shuffleExchangeCount(bucketed) == 0,
          s"bucketed join plan still shuffles:\n${bucketed.queryExecution.executedPlan}")

        val plain = orders.join(lineitem, Seq("o_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        assert(Bucketing.shuffleExchangeCount(plain) > 0,
          "control: the plain-parquet join should shuffle")
        assert(rowCounts(bucketed) == rowCounts(plain))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }

  test("shuffleExchangeCount sees a shuffle hidden behind exchange reuse") {
    import spark.implicits._
    // identical aggregation subplans on both join sides: the planner
    // computes ONE exchange and wraps the second occurrence in a
    // ReusedExchangeExec leaf — an audit that misses the wrapper would
    // report 1 and could certify a reuse-bearing join as co-located
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = (0 until 100).map(i => (i % 10, i.toLong)).toDF("k", "v")
      val agg = base.groupBy("k").agg(sum("v").as("s"))
      val self = agg.join(agg.select(col("k"), col("s").as("s2")), Seq("k"))
      val plan = self.queryExecution.executedPlan
      assert(Bucketing.shuffleExchangeCount(self) == 2,
        s"expected both occurrences of the reused exchange counted:\n$plan")
      // the executed-cost view of the same plan: one exchange RUNS, the
      // second occurrence is a reuse read — occurrence semantics and
      // cost semantics must agree on their sum
      val (distinct, reuse) = Bucketing.executedShuffleCount(self)
      assert(distinct == 1 && reuse == 1,
        s"expected 1 executed + 1 reused, got ($distinct, $reuse):\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("executedShuffleCount without reuse equals the occurrence count") {
    import spark.implicits._
    val base = (0 until 100).map(i => (i % 10, i.toLong)).toDF("k", "v")
    val agg = base.groupBy("k").agg(sum("v").as("s")).orderBy("k")
    val (distinct, reuse) = Bucketing.executedShuffleCount(agg)
    assert(reuse == 0)
    assert(distinct == Bucketing.shuffleExchangeCount(agg))
    assert(distinct >= 1)
  }

  test("mismatched bucket counts degrade to a correct shuffled join") {
    val dir = "/root/testdata/sf0.001"
    val nation = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val supplier = Tables.load(spark, dir, "supplier")
      .select(col("s_nationkey").as("n_nationkey"), col("s_acctbal"))
    Bucketing.writeBucketed(nation, "bkt_nation", "n_nationkey", 4)
    Bucketing.writeBucketed(supplier, "bkt_supplier", "n_nationkey", 8)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Bucketing.bucketedJoin(spark, "bkt_nation", "bkt_supplier", "n_nationkey")
        val expected = nation.join(supplier, Seq("n_nationkey"))
        assert(rowCounts(j) == rowCounts(expected))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_nation")
      spark.sql("DROP TABLE IF EXISTS bkt_supplier")
    }
  }
}
