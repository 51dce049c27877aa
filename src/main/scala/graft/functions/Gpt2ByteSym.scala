package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: GPT-2 byte-level symbolization — each
  * UTF-8 BYTE of the input mapped through the published bytes→unicode
  * table (printable ASCII and most of Latin-1 map to themselves, the
  * rest shift to U+0100+; space famously becomes 'Ġ'), joined with the
  * byte-symbol separator U+0400. This is the step between the GPT-2
  * pretokenizer and the merge fold: merges.txt entries like "Ġ t" apply
  * to THESE symbols, not to raw characters. A composed-functions form
  * would have to explode per CHARACTER and could not see multi-byte
  * UTF-8 sequences; one native expression does the byte walk in a
  * single codegen call (the MinHashSignature pattern).
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - GPT-2 byte-encoded symbols of str, U+0400-joined.",
  examples = "> SELECT _FUNC_(' the');")
case class Gpt2ByteSym(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gpt2_byte_sym expects a string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Gpt2ByteSym.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("gpt2ByteSymMod", Gpt2ByteSym,
      Gpt2ByteSym.getClass.getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $mod.compute($s);")
  }

  override def prettyName: String = "gpt2_byte_sym"

  override protected def withNewChildInternal(newChild: Expression): Gpt2ByteSym =
    copy(child = newChild)
}

object Gpt2ByteSym {

  /** The published GPT-2 bytes→unicode table: bytes in
    * [!..~] ∪ [¡..¬] ∪ [®..ÿ] map to their own codepoint; the remaining
    * 68 bytes map to 256+n in table order. Image tops out at U+0143, so
    * U+0400 is a safe symbol separator.
    */
  val ByteEncoder: Array[Char] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val enc = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) enc(b) = b.toChar
      else { enc(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    enc
  }

  val ByteDecoder: Map[Char, Int] =
    ByteEncoder.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Byte-symbol separator (explicit escape per the r3 control-char
    * rule): U+0400, outside the byte-encoder image.
    */
  val Sep: Char = '\u0400'

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      if (i > 0) sb.append(Sep)
      sb.append(ByteEncoder(bytes(i) & 0xff))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Driver-side reference form (spec fixtures, vocab precomputation). */
  def symbolize(s: String): String =
    compute(UTF8String.fromString(s)).toString
}
