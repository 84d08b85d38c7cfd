package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksdb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("transformWithState running fold: state persists across triggers (reference keyed sum)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Long)]
      val folded = KeyedState.runningFoldTws[String, (String, Long), Long](
        in.toDS(), _._1, 0L)((s, v) => s + v._2)
        .toDF("key", "total")
      val q = folded.writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try {
        in.addData(("foo", 1L), ("bar", 5L))
        q.processAllAvailable()
        in.addData(("foo", 2L)) // second trigger folds onto RocksDB state
        q.processAllAvailable()
        val got = spark.table("tws_out").groupBy("key").agg(max("total").as("t"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        // identical to StreamingSliceSpec's mapGroupsWithState fold —
        // the two APIs must agree on the reference's e2e keyed sums
        assert(got == Map("foo" -> 3L, "bar" -> 5L))
      } finally q.stop()
    }
  }

  test("transformWithState and mapGroupsWithState emit identical per-trigger outputs") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      def run(useTws: Boolean): Seq[(String, Long)] = {
        val in = MemoryStream[(String, Long)]
        val ds = in.toDS()
        val folded =
          if (useTws) KeyedState.runningFoldTws[String, (String, Long), Long](
            ds, _._1, 0L)((s, v) => s + v._2)
          else KeyedState.runningFold[String, (String, Long), Long](
            ds, _._1, 0L)((s, v) => s + v._2)
        val name = if (useTws) "par_tws" else "par_mgs"
        val q = folded.toDF("key", "total").writeStream.outputMode("update")
          .format("memory").queryName(name).start()
        try {
          in.addData(("a", 2L), ("b", 3L), ("a", 4L))
          q.processAllAvailable()
          in.addData(("b", 1L), ("c", 7L))
          q.processAllAvailable()
          spark.table(name).collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
        } finally q.stop()
      }
      assert(run(useTws = true) == run(useTws = false))
    }
  }

  test("a non-NONE TTL starts (processing-time mode) and folds normally within the TTL window") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Long)]
      // a generous TTL: state must survive the whole test, proving the
      // TTLConfig + TimeMode combination is accepted at query start
      // (the old hardcoded TimeMode.None rejected any real TTL)
      val folded = KeyedState.runningFoldTws[String, (String, Long), Long](
        in.toDS(), _._1, 0L,
        ttl = org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))(
        (s, v) => s + v._2)
        .toDF("key", "total")
      val q = folded.writeStream.outputMode("update")
        .format("memory").queryName("tws_ttl_out").start()
      // processing-time mode schedules TTL wake-up work continuously,
      // so processAllAvailable never settles — poll the sink instead
      def maxTotal(): Long = {
        val rows = spark.table("tws_ttl_out").agg(max("total")).collect()
        if (rows.isEmpty || rows.head.isNullAt(0)) -1L else rows.head.getLong(0)
      }
      def awaitTotal(expect: Long): Unit = {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (maxTotal() != expect && System.nanoTime() < deadline &&
          q.exception.isEmpty) Thread.sleep(100)
        assert(maxTotal() == expect,
          s"sink never reached $expect; query exception: ${q.exception}")
      }
      try {
        in.addData(("k", 10L))
        awaitTotal(10L)
        in.addData(("k", 5L))
        awaitTotal(15L)
      } finally q.stop()
    }
  }
}
