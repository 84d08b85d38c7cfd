package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane LSH signature as ONE native codegen'd expression.
  *
  * The hyperplane values depend only on (plane index, dim index) —
  * h_i[d] = hex6(md5(s"${i}_${d}")) / 2^24 - 0.5 — so they are computed
  * ONCE driver-side (LshPlanes.planes) and embedded as a literal 2-D
  * array. The previous formulation evaluated the same md5-of-constant
  * per ROW per ELEMENT inside interpreted higher-order functions:
  * dim × nPlanes (= 512 at 64-d/8-planes) interpreted md5s per row,
  * which alone cost 22.6 s of the sf0.1 bench. This expression is a
  * primitive double loop over the ArrayData buffer — same numbers,
  * constant factor gone.
  *
  * Numeric contract (oracle parity, see Similarity.lshSignature docs):
  * elements widen float→double (exact) and accumulate sequentially
  * left-to-right per plane — identical to the sequential `aggregate`
  * fold it replaces — and each projection is rounded HALF_UP to 6 d.p.
  * (Spark Round semantics) BEFORE the sign test, so the bucketing is
  * bit-identical to both the old formulation and the DuckDB oracle.
  */
case class LshSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature requires an array<float> input, got $other")
  }

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    UTF8String.fromBytes(LshSignature.signatureBytes(v, planeArr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |  graft.functions.LshSignature.signatureBytes($v, $planesRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignature {
  /** Shared by interpreted eval and generated code: one '0'/'1' byte per
    * plane, sign-tested on the 6-d.p.-rounded sequential projection.
    *
    * Length/null contract matches the reference formulation exactly: a
    * vector whose length differs from dim, or with a null element,
    * yields a NULL projection there (zip_with pads the shorter side
    * with nulls; null propagates through the fold), and `when(null >=
    * 0)` falls to the '0' branch — so such rows emit all-'0' bits, not
    * the sign of a silent prefix dot product. */
  def signatureBytes(v: ArrayData, planes: Array[Array[Double]]): Array[Byte] = {
    val out = new Array[Byte](planes.length)
    var degenerate = false
    if (planes.length > 0 && v.numElements() != planes(0).length) degenerate = true
    else {
      var d = 0
      while (!degenerate && d < v.numElements()) {
        if (v.isNullAt(d)) degenerate = true
        d += 1
      }
    }
    var i = 0
    while (i < planes.length) {
      if (degenerate) out(i) = '0'.toByte
      else {
        val h = planes(i)
        var acc = 0.0
        var d = 0
        while (d < h.length) { acc += v.getFloat(d).toDouble * h(d); d += 1 }
        val rounded = java.math.BigDecimal.valueOf(acc)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        out(i) = if (rounded >= 0) '1'.toByte else '0'.toByte
      }
      i += 1
    }
    out
  }

  /** Deterministic pseudo-hyperplanes: h_i[d] = hex6(md5(i||'_'||d))/2^24
    * - 0.5 — the exact double the old column formulation produced via
    * conv(substring(md5(..),1,6),16,10)/16777216.0 - 0.5, and what the
    * l20 DuckDB oracle computes independently in SQL. `table` > 0 salts
    * the md5 key (multi-table LSH: independent plane sets whose
    * candidate union trades compute for recall); table 0 is EXACTLY the
    * original/oracle formula. */
  def planes(dim: Int, nPlanes: Int, table: Int = 0): Seq[Seq[Double]] =
    (0 until nPlanes).map { i =>
      (0 until dim).map { d =>
        val key = if (table == 0) s"${i}_${d}" else s"t${table}_${i}_${d}"
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(key.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 6)
        java.lang.Long.parseLong(hex, 16).toDouble / 16777216.0 - 0.5
      }
    }
}

object LshFunctions {
  /** Codegen'd LSH bucket signature of an Array[Float] column. */
  def lshSignature(vec: Column, dim: Int, nPlanes: Int, table: Int = 0): Column =
    GraftBridge.column(LshSignature(
      GraftBridge.expression(vec), LshSignature.planes(dim, nPlanes, table)))
}
