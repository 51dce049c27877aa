package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: whitespace-token count AND BPE-ish piece
  * count of a text column in ONE byte scan —
  * `struct(n_tokens, n_pieces)`.
  *
  * Replaces two independent passes that both materialized arrays just to
  * count them: `size(filter(split(trim(text), "\\s+"), ...))` (a regex
  * split allocating every token string) and
  * `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))`
  * (the regex engine allocating every matched piece). Both definitions
  * are plain character-class run logic, so one scan over the UTF-8
  * BYTES computes them with zero allocation:
  *  - `n_tokens`: number of maximal non-whitespace runs (\\s = the ASCII
  *    java-regex class, matching the split form);
  *  - `n_pieces`: one per [A-Za-z]+ run, per single digit, per other
  *    non-whitespace CODE POINT (UTF-8 lead bytes count, continuation
  *    bytes don't — each non-ASCII code point is one `[^A-Za-z0-9\\s]`
  *    match, exactly the regex alternation's semantics).
  *
  * The q27 DuckDB oracle keeps the definitional regex forms — the hash
  * match pins this scanner to them.
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - struct(n_tokens, n_pieces): whitespace tokens and BPE-ish pieces in one scan.",
  examples = "> SELECT _FUNC_('ab 12 c!');")
case class TextPieceCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"text_piece_counts expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextPieceCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("textPieceCountsMod", TextPieceCounts,
      TextPieceCounts.getClass.getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $mod.compute($s);")
  }

  override def prettyName: String = "text_piece_counts"

  override protected def withNewChildInternal(newChild: Expression): TextPieceCounts =
    copy(child = newChild)
}

object TextPieceCounts {

  def compute(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    var nTokens = 0L
    var nPieces = 0L
    var inToken = false
    var prevAlpha = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) { // skip UTF-8 continuation bytes
        val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
          b == '\f' || b == '\r'
        if (isWs) { inToken = false; prevAlpha = false }
        else {
          if (!inToken) { nTokens += 1; inToken = true }
          val isAlpha = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
          if (isAlpha) {
            if (!prevAlpha) nPieces += 1
            prevAlpha = true
          } else { // digit, ASCII punct, or non-ASCII code point: 1 each
            prevAlpha = false
            nPieces += 1
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, nPieces))
  }
}
