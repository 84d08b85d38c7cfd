package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash h = fold(h·31 + codepoint) mod 1e9+7 over a
  * string, as one codegen'd primitive loop per row.
  *
  * Replaces `aggregate(transform(split(text, ""), ascii), ...)`, which
  * materializes a per-CHARACTER array and then interprets two lambda
  * dispatches per element — for a 100 TB corpus the array allocation
  * and boxing are the dominant cost of the fingerprint.
  *
  * Semantics contract (oracle parity with DuckDB
  * `list_reduce(list_prepend(0, list_transform(string_split(text,''),
  * ascii)))`): the fold visits CODE POINTS left-to-right (split("")
  * keeps surrogate pairs whole and `ascii` yields the full code point);
  * the empty string hashes to 0 (the HOF form folds a single ascii('')
  * = 0 element — same result). All values stay < 2^63: acc < 1e9+7,
  * acc·31 + cp < 2^35.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + (long) $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashFunctions {
  /** Codegen'd polynomial rolling hash of a string column (long result). */
  def rollingHash(text: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(text)))
}
