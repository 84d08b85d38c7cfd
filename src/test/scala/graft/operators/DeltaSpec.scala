package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The x22 losslessness gate must actually FIRE — a tripwire no test
  * ever trips is indistinguishable from decoration. Every corruption
  * class a round-trip can introduce (lost row, invented row,
  * duplicated row, value drift, null flip) must leave a non-zero
  * delta; permutations and layout must not. */
class DeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", "x"), (2L, "b", "y"), (3L, "c", null), (3L, "c", null)
  ).toDF("id", "s", "t")

  test("multiset-equal frames (any order, any layout, duplicate rows intact) pass") {
    assert(Delta.driftedGroups(base, base) == 0)
    assert(Delta.driftedGroups(base.orderBy(col("id").desc), base.repartition(7)) == 0)
    Delta.assertLossless(base, base, "self")
  }

  test("every corruption class fires the gate") {
    val lost = base.limit(3)
    assert(Delta.driftedGroups(lost, base) > 0)
    val invented = base.union(Seq((9L, "z", "q")).toDF("id", "s", "t"))
    assert(Delta.driftedGroups(invented, base) > 0)
    // one duplicate of a duplicated row: counts 3 vs 2 on the same values
    val duped = base.union(base.filter(col("id") === 3).limit(1))
    assert(Delta.driftedGroups(duped, base) > 0)
    val drifted = base.withColumn("t", when(col("id") === 2, lit("Y")).otherwise(col("t")))
    assert(Delta.driftedGroups(drifted, base) > 0)
    // null flipped to empty string — the CSV-style corruption
    val nullFlip = base.withColumn("t", coalesce(col("t"), lit("")))
    assert(Delta.driftedGroups(nullFlip, base) > 0)
    val e = intercept[IllegalArgumentException](Delta.assertLossless(lost, base, "csv"))
    assert(e.getMessage.contains("csv round-trip lost or changed"))
  }

  test("schema mismatches and reserved names fail loudly instead of comparing garbage") {
    assert(intercept[IllegalArgumentException](
      Delta.driftedGroups(base.select("id", "s"), base)).getMessage.contains("identical schemas"))
    assert(intercept[IllegalArgumentException](
      Delta.driftedGroups(base.withColumn("_sgn", lit(0)),
        base.withColumn("_sgn", lit(0)))).getMessage.contains("_sgn"))
  }

  test("silent type widening fires the gate even when values coerce equal") {
    // the round-trip that turned long→int (a lossy writer default):
    // unionByName would coerce both to long and every value would
    // match — name-only schema comparison passes what is in fact a
    // format change. The gate must name the drifted column and types.
    val narrowed = base.withColumn("id", col("id").cast("int"))
    val e = intercept[IllegalArgumentException](Delta.driftedGroups(narrowed, base))
    assert(e.getMessage.contains("column types drifted"))
    assert(e.getMessage.contains("id"))
    // float→double on a fractional column, same shape
    val f = base.withColumn("v", lit(1.5f))
    val widened = f.withColumn("v", col("v").cast("double"))
    assert(intercept[IllegalArgumentException](
      Delta.driftedGroups(widened, f)).getMessage.contains("FloatType"))
  }
}
