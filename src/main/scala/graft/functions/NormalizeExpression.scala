package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the first
  * transform of any text-curation pipeline over web crawl: composed vs
  * decomposed accent encodings ("é" as U+00E9 vs "e"+U+0301) must
  * collapse BEFORE hashing, or exact/MinHash dedup silently treats
  * byte-different spellings of the same text as distinct documents.
  * The reference's cleaning stage (pspf/processors/text_clean.py)
  * lowercases and strips; NFC is the missing canonicalization step a
  * multilingual corpus needs.
  *
  * Spark ships no normalization built-in, so this wraps
  * java.text.Normalizer (ICU-equivalent for NFC) as a UnaryExpression
  * with doGenCode: one JVM call per row inside whole-stage codegen —
  * no UDF serialization, null-safety from nullSafeCodeGen. The
  * fast path skips allocation entirely when the input is already
  * normalized (Normalizer.isNormalized is a cheap scan and true for
  * ~all real text), so the common case is zero-copy.
  *
  * Oracle parity: DuckDB's `nfc_normalize` implements the same UAX #15
  * NFC; both sides agree byte-for-byte on any input.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted + codegen paths (the generated code calls
    * this static method — keeping the logic in one place). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object NormalizeFunctions {
  /** Codegen'd Unicode NFC normalization of a string column. */
  def nfcNormalize(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
