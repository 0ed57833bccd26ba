package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side NFC kernel, separated so generated code can call it through
  * the Scala static forwarder (`NfcNormalizeUtil.nfc(...)` is valid
  * Java). The `isNormalized` fast path returns the INPUT UTF8String for
  * already-composed text — the overwhelmingly common case — so the hot
  * loop allocates nothing. */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen `Expression` — the
  * text-canonicalization step of crawl ingest (decomposed "é" ≡ composed
  * "é"; without it, exact dedup, vocabulary counts, and term lookups all
  * split on byte-different equal strings). Spark ships no normalizer
  * built-in, and a Scala UDF here would box every row out of
  * whole-stage codegen — this is the (b)-tier custom-expression path of
  * the build plan, like [[DotProduct]]. Semantics are the JDK's
  * Unicode-conformant NFC, matching DuckDB's utf8proc `NFC_NORMALIZE`
  * on conformant input (both implement UAX #15).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
