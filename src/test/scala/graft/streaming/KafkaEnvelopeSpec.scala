package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KafkaConnector's envelope mapping, testable without a broker or the
  * kafka jar: wrap/unwrap are pure DataFrame transforms (reference:
  * KafkaStreamBackend produce/consume payload handling,
  * pspf/connectors/kafka.py:105-147 — JSON value with in-payload
  * event_type, pspf/stream.py:235-247).
  */
class KafkaEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("wrap serializes all columns into value; unwrap restores payload + event_type") {
    val conn = new KafkaConnector("unused:9092")
    val out = Seq(("e1", "order", 42.0)).toDF("event_id", "event_type", "amount")

    val wrapped = conn.wrap(out)
    assert(wrapped.columns.toSeq == Seq("value"))
    val valueJson = wrapped.as[String].head()
    assert(valueJson.contains("\"event_id\":\"e1\"") && valueJson.contains("\"amount\":42.0"))

    // shape of a kafka source row: key/value binary + metadata cols
    val sourceShaped = wrapped.select(
      lit("e1").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      lit("orders").as("topic"), lit(0).as("partition"), lit(7L).as("offset"),
      current_timestamp().as("timestamp"))
    val row = conn.unwrap(sourceShaped).collect().head
    assert(row.getAs[String]("payload") == valueJson)
    assert(row.getAs[String]("event_type") == "order") // extracted from the payload
    assert(row.getAs[String]("key") == "e1")
    assert(row.getAs[Long]("offset") == 7L)
  }
}
