package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-exact session behavior (pspf/stream.py:415-451): the active
  * session extends within gap, is replaced silently beyond it, and the
  * always-current state is observable per trigger — unlike Spark's
  * session_window which emits only finalized sessions. */
class SessionStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("active session extends within gap, replaced beyond it, in-progress state visible") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double, Double)]
    val q = SessionState.activeSessions(in.toDS(), gapSec = 10.0)
      .toDF("key", "session")
      .select(col("key"), col("session.start"), col("session.last"), col("session.agg"))
      .writeStream.outputMode("update").format("memory").queryName("sess_out").start()
    try {
      in.addData(("k", 0.0, 1.0), ("k", 5.0, 2.0))
      q.processAllAvailable()
      val mid = spark.table("sess_out").orderBy(desc("last")).limit(1)
        .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
      assert(mid == (0.0, 5.0, 3.0)) // in-progress session visible (reference parity)

      in.addData(("k", 30.0, 7.0)) // beyond gap → fresh session, old never emitted
      q.processAllAvailable()
      val fin = spark.table("sess_out").orderBy(desc("last")).limit(1)
        .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
      assert(fin == (30.0, 30.0, 7.0))
    } finally q.stop()
  }
}
