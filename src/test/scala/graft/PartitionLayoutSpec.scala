package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Storage-layout levers for the 100 TB posture, proven live:
  * partition pruning (directory-level skip) and bucketed joins
  * (shuffle-free co-located join). The driver's testdata is single
  * parquet files, so these write derived layouts under a temp dir.
  */
class PartitionLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hive-partitioned write + filter → scan reads only matching partitions") {
    val root = Files.createTempDirectory("graft_part").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").parquet(s"$root/events_p")

    val q = spark.read.parquet(s"$root/events_p")
      .filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    // partition filter must appear as PartitionFilters, not a row filter
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("PushedFilters: [IsNotNull(event_type)"))
    assert(q.count() > 0)
    // directory layout really is per-type
    assert(new java.io.File(s"$root/events_p/event_type=click").isDirectory)
  }

  test("bucketed tables join without an exchange") {
    // warehouse.dir is a static conf — bucketed tables land in the
    // default ./spark-warehouse (gitignored), dropped in finally.
    // save/restore: the session's threshold is settings-driven, so a
    // hardcoded restore would silently rewrite it for later suites
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables.load(spark, "/root/testdata/sf0.001", "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 6000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
