package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema registry dispatch + open fallback + corrupt flag (reference:
  * pspf/schema.py:28-57 registry, tests/test_unit.py:10-30 fixtures —
  * DummySchema registered for TestType, unknown types fall back open).
  */
class SchemaRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered type parses; unknown type falls back open; corrupt flagged") {
    val reg = new SchemaRegistry
    reg.register("TestType", StructType(Seq(StructField("name", StringType, nullable = false))))

    val df = Seq(
      ("TestType", """{"name": "alice"}"""),
      ("TestType", """not json at all"""),
      ("Mystery", """{"whatever": 1}""")
    ).toDF("event_type", "payload")

    val out = reg.parse(df).select("event_type", "parsed", "_corrupt").collect()
    val byType = out.map(r => (r.getString(0), (r.getString(1), r.getBoolean(2))))

    val testRows = byType.filter(_._1 == "TestType").map(_._2)
    assert(testRows.contains(("""{"name":"alice"}""", false)))
    assert(testRows.exists(_._2 == true)) // the corrupt row
    val mystery = byType.filter(_._1 == "Mystery").map(_._2).head
    assert(mystery._1 == null && !mystery._2) // open fallback, not corrupt
  }

  test("additive evolution is compatible; type change / non-null add is not") {
    val reg = new SchemaRegistry
    val v1 = StructType(Seq(StructField("a", LongType)))
    val v2 = StructType(Seq(StructField("a", LongType), StructField("b", StringType, nullable = true)))
    val v3 = StructType(Seq(StructField("a", StringType)))
    val v4 = StructType(Seq(StructField("a", LongType), StructField("b", StringType, nullable = false)))
    assert(reg.compatible(v1, v2))
    assert(!reg.compatible(v1, v3))
    assert(!reg.compatible(v1, v4))
  }

  test("registerChecked enforces the evolution policy at registration time") {
    val reg = new SchemaRegistry
    val v1 = StructType(Seq(StructField("a", LongType)))
    val v2 = StructType(Seq(StructField("a", LongType), StructField("b", StringType, nullable = true)))
    val bad = StructType(Seq(StructField("a", StringType)))
    reg.registerChecked("t", v1)
    reg.registerChecked("t", v2) // additive → allowed
    assert(reg.schemaFor("t").contains(v2))
    intercept[IllegalArgumentException] { reg.registerChecked("t", bad) }
    assert(reg.schemaFor("t").contains(v2)) // old schema survives the rejected update
  }
}
