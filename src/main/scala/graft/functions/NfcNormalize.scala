package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical first step of corpus
  * hygiene: the same text crawled from two sources can differ only in
  * combining-mark composition ("café" as `e`+U+0301 vs U+00E9, Å as
  * U+212B vs U+00C5), which silently defeats exact dedup, shingle
  * matching, fingerprinting, and tokenizer vocabularies. Normal Form C
  * (canonical decomposition + canonical composition, UAX #15) maps all
  * canonically-equivalent spellings to one byte sequence.
  *
  * Spark ships no normalization function, so this is a native codegen
  * expression over `java.text.Normalizer` (ICU-equivalent for NFC — both
  * implement UAX #15 over the same Unicode data; DuckDB's
  * `nfc_normalize` agrees byte-for-byte, which is what makes the
  * operator oracle-able).
  *
  * 100 TB-path notes: stays inside whole-stage codegen (static method
  * call, no UDF boundary), and the dominant real-world case — text that
  * is ALREADY NFC, which includes all pure-ASCII text — takes the
  * allocation-free `Normalizer.isNormalized` fast path (a scan that
  * bails at the first non-latin1 char at quick-check speed) and returns
  * the input UTF8String unchanged.
  */
object NfcNormalize {

  def nfc(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column API: NFC-normalize a string column. */
  def nfc_normalize(c: Column): Column = shims.column(NfcNormalizeExpr(shims.expression(c)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
