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

/** Native Catalyst expression: diacritic stripping — NFD canonical
  * decomposition then removal of combining marks (\p{Mn}), the
  * `strip_accents=True` step of BERT-family lowercase tokenizers and of
  * accent-insensitive dedup keys. Characters with no canonical
  * decomposition (ø, ß) pass through, matching ICU semantics — which is
  * what makes the q252 DuckDB twin (`strip_accents`) an independent-
  * implementation oracle (the q245 pattern).
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - str with diacritics removed (NFD + strip combining marks).",
  examples = "> SELECT _FUNC_('re\\u0301sume\\u0301');")
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects a string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    StripAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("stripAccentsMod", StripAccents,
      StripAccents.getClass.getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $mod.compute($s);")
  }

  override def prettyName: String = "strip_accents"

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  def compute(s: UTF8String): UTF8String = {
    val t = s.toString
    // fast path: no decomposition pending and no combining marks present
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFD)
        && !hasMark(t)) {
      if (java.text.Normalizer
          .isNormalized(t, java.text.Normalizer.Form.NFC)) return s
    }
    val nfd = java.text.Normalizer.normalize(t,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // recompose what remains so "ç" (two NFD codepoints minus the
    // cedilla) reads back as plain composed text
    UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC))
  }

  private def hasMark(t: String): Boolean = {
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) return true
      i += Character.charCount(cp)
    }
    false
  }
}
