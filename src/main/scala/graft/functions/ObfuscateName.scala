package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Name-obfuscation mask (reference operator S2,
  * `/root/reference/src/datalake_to_mart.py:133-144`).
  *
  * Semantics, reproduced exactly from the reference's observable behavior:
  *   - token 0 (split on single spaces) is the first name, kept verbatim;
  *   - the remainder, re-joined with spaces, is the "last name";
  *   - within the last name, a character survives iff it equals the FIRST
  *     character of the last name (case-sensitively, anywhere it appears,
  *     including inside later words) or is a space; every other character
  *     becomes '*';
  *   - result = firstName + " " + maskedLastName. A single-token name
  *     therefore yields `first + " "` (trailing space — faithfully kept);
  *     an empty string yields `" "`.
  *
  * Example: "Lane Weber Obama" → last name "Weber Obama", first char 'W'
  * → "Lane W**** *****".
  *
  * Implemented as a native Catalyst expression whose codegen emits a call
  * to the static [[ObfuscateName.mask]] over UTF8String — stays inside
  * whole-stage codegen (no UDF serialization, no encoder round-trip), which
  * is the 100 TB-path requirement for a per-row string transform.
  */
object ObfuscateName {

  /** Pure mask on UTF8String (operates on code points via String). */
  def mask(input: UTF8String): UTF8String = {
    val s = input.toString
    val sp = s.indexOf(' ')
    if (sp < 0) {
      // Single token: empty last name; reference emits `first + " "`.
      UTF8String.fromString(s + " ")
    } else if (sp == s.length - 1) {
      // Trailing-space-only name ("Lane "): empty last name, kept as-is.
      UTF8String.fromString(s)
    } else {
      val first = s.substring(0, sp)
      val last = s.substring(sp + 1)
      // operate on CODE POINTS like the Python reference: a char-wise
      // loop would half-mask surrogate pairs and emit lone surrogates
      val keep = last.codePointAt(0)
      val sb = new java.lang.StringBuilder(s.length)
      sb.append(first).append(' ')
      var i = 0
      while (i < last.length) {
        val cp = last.codePointAt(i)
        if (cp == keep || cp == ' ') sb.appendCodePoint(cp) else sb.append('*')
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Column API: obfuscate a string column. */
  def obfuscate_name(c: Column): Column = shims.column(ObfuscateNameExpr(shims.expression(c)))
}

case class ObfuscateNameExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"obfuscate_name requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "obfuscate_name"

  override def nullSafeEval(input: Any): Any =
    ObfuscateName.mask(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ObfuscateName.mask($c)")

  override protected def withNewChildInternal(newChild: Expression): ObfuscateNameExpr =
    copy(child = newChild)
}
