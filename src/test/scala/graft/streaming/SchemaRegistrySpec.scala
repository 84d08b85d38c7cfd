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

  test("alias rename: old and new wire names both parse into the canonical field") {
    val reg = new SchemaRegistry
    reg.register("signup", StructType(Seq(
      StructField("user_id", StringType), StructField("plan", StringType))))
    reg.registerEvolution("signup", Evolution(aliases = Map("user_id" -> Seq("uid"))))

    val df = Seq(
      ("signup", """{"user_id": "new1", "plan": "pro"}"""),
      ("signup", """{"uid": "old1", "plan": "free"}"""),
      ("signup", """{"user_id": "both", "uid": "loser", "plan": "pro"}""")
    ).toDF("event_type", "payload")

    val out = reg.parse(df).select("parsed", "_corrupt")
      .as[(String, Boolean)].collect().toSet
    assert(out == Set(
      ("""{"user_id":"new1","plan":"pro"}""", false),
      ("""{"user_id":"old1","plan":"free"}""", false),
      // canonical name wins when both are present (AliasChoices order)
      ("""{"user_id":"both","plan":"pro"}""", false)))
  }

  test("coercion: legacy wire types cast to the canonical type; uncastable flags corrupt") {
    val reg = new SchemaRegistry
    reg.register("order", StructType(Seq(
      StructField("sku", StringType), StructField("price", DoubleType))))
    reg.registerEvolution("order", Evolution(coerced = Set("price")))

    val df = Seq(
      ("order", """{"sku": "a", "price": 42.5}"""),   // new wire: double
      ("order", """{"sku": "b", "price": 41}"""),     // legacy int
      ("order", """{"sku": "c", "price": "40.25"}"""),// legacy stringified
      ("order", """{"sku": "d", "price": "oops"}"""), // garbage → corrupt
      ("order", """{"sku": "e"}""")                   // absent stays null, not corrupt
    ).toDF("event_type", "payload")

    val out = reg.parse(df).select("parsed", "_corrupt")
      .as[(String, Boolean)].collect().toSet
    assert(out == Set(
      ("""{"sku":"a","price":42.5}""", false),
      ("""{"sku":"b","price":41.0}""", false),
      ("""{"sku":"c","price":40.25}""", false),
      ("""{"sku":"d"}""", true),
      ("""{"sku":"e"}""", false)))
  }

  test("rename + coercion compose: aliased legacy field coerces through the alias") {
    val reg = new SchemaRegistry
    reg.register("m", StructType(Seq(StructField("amount", DoubleType))))
    reg.registerEvolution("m", Evolution(
      aliases = Map("amount" -> Seq("amt")), coerced = Set("amount")))
    val df = Seq(("m", """{"amt": "7.75"}""")).toDF("event_type", "payload")
    val out = reg.parse(df).select("parsed", "_corrupt").as[(String, Boolean)].collect()
    assert(out.toSeq == Seq(("""{"amount":7.75}""", false)))
  }

  test("evolution registration validates field references and alias collisions") {
    val reg = new SchemaRegistry
    reg.register("t", StructType(Seq(StructField("a", StringType), StructField("b", StringType))))
    intercept[IllegalArgumentException] {
      reg.registerEvolution("t", Evolution(aliases = Map("missing" -> Seq("x"))))
    }
    intercept[IllegalArgumentException] {
      reg.registerEvolution("t", Evolution(aliases = Map("a" -> Seq("b")))) // collides with canonical
    }
    intercept[IllegalArgumentException] {
      reg.registerEvolution("t", Evolution(aliases = Map("a" -> Seq("x"), "b" -> Seq("x"))))
    }
    intercept[IllegalArgumentException] {
      reg.registerEvolution("unregistered", Evolution())
    }
    intercept[IllegalArgumentException] { // reserved corrupt-record column
      reg.registerEvolution("t", Evolution(aliases = Map("a" -> Seq("_corrupt_record"))))
    }
    // the reserved name is rejected at BOTH registration doors too
    val reserved = StructType(Seq(StructField("_corrupt_record", StringType)))
    intercept[IllegalArgumentException] { reg.register("r1", reserved) }
    intercept[IllegalArgumentException] { reg.registerChecked("r2", reserved) }
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
