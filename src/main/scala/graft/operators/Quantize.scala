package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the 4× storage /
  * shuffle-bytes lever for vector corpora (float32 → int8 ahead of ANN
  * or archival; at 100 TB the embedding column IS the shuffle cost of
  * every similarity pass, so this is a first-class curation op).
  *
  * Symmetric per-vector scheme: scale = max|x| / 127, q = round(x /
  * scale) clamped to [-127, 127] (the clamp is belt-and-braces: by
  * construction |x/scale| <= 127 up to one ulp). Zero vectors quantize
  * to all-zero with scale 0 — no NaN poisoning.
  *
  * Engine determinism: max|x| is an exact float→double max (order-free),
  * scale one IEEE division, each q element one division + one
  * HALF_UP/away-from-zero round — Spark's BigDecimal HALF_UP and
  * DuckDB's round() agree away from zero, so quantized values are
  * bit-identical cross-engine. All map-side column ops: zero shuffle.
  */
object Quantize {

  def maxAbs(vec: Column): Column =
    array_max(transform(vec, e => abs(e.cast("double"))))

  /** Per-vector quantization scale (0.0 for the zero vector). */
  def scaleOf(vec: Column): Column = maxAbs(vec) / lit(127.0)

  /** int8 codes (as array<int> — parquet/arrow byte-pack downstream). */
  def int8(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, e =>
        least(lit(127), greatest(lit(-127),
          round(e.cast("double") / scale, 0).cast("int")))))

  /** Reconstruction: q * scale as array<double>. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, e => e.cast("double") * scale)

  /** Per-vector quality report: (id, scale, q_sum, max_abs_err,
    * cos_deq). q_sum is an exact integer checksum of the codes;
    * max_abs_err is an order-free max of IEEE-deterministic per-element
    * errors (no summation-order hazard); cos_deq is the cosine between
    * the original and its reconstruction, 6-d.p.-rounded like every
    * cosine in this library. */
  def stats(df: DataFrame, id: String, vec: String): DataFrame = {
    val x = col(vec)
    val out = df
      .withColumn("scale", scaleOf(x))
      .withColumn("q", int8(x, col("scale")))
    val err = zip_with(x, col("q"), (e, qq) =>
      abs(e.cast("double") - qq.cast("double") * col("scale")))
    val dotXQ = aggregate(
      zip_with(x, col("q"), (e, qq) => e.cast("double") * (qq.cast("double") * col("scale"))),
      lit(0.0), (acc, v) => acc + v)
    val n2x = aggregate(x, lit(0.0), (acc, e) => acc + e.cast("double") * e.cast("double"))
    val n2q = aggregate(col("q"), lit(0.0),
      (acc, qq) => acc + (qq.cast("double") * col("scale")) * (qq.cast("double") * col("scale")))
    out.select(col(id),
      col("scale"),
      aggregate(col("q"), lit(0L), (acc, qq) => acc + qq.cast("long")).as("q_sum"),
      array_max(err).as("max_abs_err"),
      when(n2x === 0.0 || n2q === 0.0, lit(0.0))
        .otherwise(round(dotXQ / (sqrt(n2x) * sqrt(n2q)), 6)).as("cos_deq"))
  }
}
