package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the SymSpell deletion-signature hash array
  * of a string — `[xxhash64(s), xxhash64(delete(s,1)), …,
  * xxhash64(delete(s,len))]`, one entry per 1-CHARACTER deletion variant
  * (codepoint semantics, matching `substr`), plus the string itself first.
  *
  * Bit-identical to the composable form
  * `transform(sequence(0, length(s)), i -> xxhash64(CASE WHEN i=0 THEN s
  * ELSE concat(substr(s,1,i-1), substr(s,i+1,len-i)) END))` — the same
  * XXH64(seed 42) over the same variant bytes — but one fused loop over a
  * reused byte buffer instead of an interpreted per-variant
  * substring+concat+hash chain (r11: the fuzzy-linkage signature pass
  * spent 2.8 s of q134's 3.1 s there at sf0.1). Null string → null;
  * empty string → the single hash of "".
  */
@ExpressionDescription(
  usage = "_FUNC_(s) - xxhash64 of s and every 1-char deletion variant.",
  examples = "> SELECT _FUNC_('ab');")
case class DeletionSigHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deletion_sig_hashes expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DeletionSigHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("deletionSigMod", DeletionSigHashes,
      DeletionSigHashes.getClass.getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $mod.compute($s);")
  }

  override def prettyName: String = "deletion_sig_hashes"

  override protected def withNewChildInternal(
      newChild: Expression): DeletionSigHashes = copy(child = newChild)
}

object DeletionSigHashes {

  private val Seed = 42L

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // codepoint byte offsets: starts(c) = byte offset of character c
    val starts = new Array[Int](nBytes + 1)
    var nChars = 0
    var off = 0
    while (off < nBytes) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    starts(nChars) = nBytes
    val out = new Array[Long](nChars + 1)
    out(0) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, nBytes, Seed)
    if (nChars > 0) {
      val buf = new Array[Byte](nBytes)
      var c = 0
      while (c < nChars) {
        val a = starts(c) // bytes [0, a) ++ [b, nBytes) = delete char c+1
        val b = starts(c + 1)
        System.arraycopy(bytes, 0, buf, 0, a)
        System.arraycopy(bytes, b, buf, a, nBytes - b)
        out(c + 1) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET,
          nBytes - (b - a), Seed)
        c += 1
      }
    }
    new GenericArrayData(out)
  }
}
