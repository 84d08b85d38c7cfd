package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Router semantics (reference: pspf/topology.py:10-46 + fixture
  * examples/advanced_topology.py: amount>10000 → high_value_tx else
  * standard_tx; tests/test_decorators.py multi-topic dispatch).
  */
class RouterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ordered first-match routing with default") {
    val df = Seq(("t1", 20000.0), ("t2", 500.0), ("t3", 15000.0)).toDF("id", "amount")
    val router = new StreamRouter(
      Seq((col("amount") > 10000, "high_value_tx")), Some("standard_tx"))
    val got = mutable.Map.empty[String, Seq[String]]
    router.fanOutBatch(df, (leg, topic) =>
      got(topic) = leg.select("id").as[String].collect().toSeq.sorted)
    assert(got("high_value_tx") == Seq("t1", "t3"))
    assert(got("standard_tx") == Seq("t2"))
  }

  test("first match wins over later predicates; no default drops") {
    val df = Seq(1, 5, 50).toDF("v")
    val router = new StreamRouter(
      Seq((col("v") > 0, "a"), (col("v") > 10, "b")), None)
    val got = mutable.Map.empty[String, Long]
    router.fanOutBatch(df, (leg, topic) => got(topic) = leg.count())
    assert(got == mutable.Map("a" -> 3L)) // all match first predicate
  }

  test("no match and no default → row dropped") {
    val df = Seq(-1, 5).toDF("v")
    val router = new StreamRouter(Seq((col("v") > 0, "pos")), None)
    val got = mutable.Map.empty[String, Long]
    router.fanOutBatch(df, (leg, topic) => got(topic) = leg.count())
    assert(got == mutable.Map("pos" -> 1L))
  }
}
