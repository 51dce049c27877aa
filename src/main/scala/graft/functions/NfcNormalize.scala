package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * decomposition + canonical composition, UAX #15) — the text-cleanup
  * step every multilingual pretraining pipeline runs so that composed
  * and decomposed spellings ("é" vs "e"+U+0301) hash, dedup, and
  * tokenize identically. Spark has no built-in for it; this wraps the
  * JDK's conformant implementation (java.text.Normalizer), called from
  * whole-stage codegen. NFC conformance is deterministic across
  * implementations, which is what makes the q245 DuckDB twin
  * (`nfc_normalize`, ICU-backed) hash-matchable.
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - the NFC (canonical composition) normalization of str.",
  examples = "> SELECT _FUNC_('e\\u0301');")
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("nfcMod", NfcNormalize,
      NfcNormalize.getClass.getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $mod.compute($s);")
  }

  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val t = s.toString
    // already-normalized fast path: isNormalized is a cheap quick-check
    // scan and most real text is already NFC
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
  }
}
