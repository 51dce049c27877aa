package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's 60-bit md5-derived portable
  * hash — the first 15 hex digits of md5(bytes) as a long, i.e. the DuckDB
  * twin `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *
  * Bit-identical to the composable form
  * `conv(substring(md5(cast(x as binary)), 1, 15), 16, 10).cast("long")`
  * (the first 15 nibbles of the digest ARE the high 60 bits of its first
  * 8 bytes big-endian), but skips that form's three intermediate
  * allocations per value — the 32-char hex string, the 15-char substring,
  * and NumberConverter's base-16 reparse — which dominated the portable
  * sketch/minhash oracle channels (one evaluation per gram/key).
  */
@ExpressionDescription(
  usage = "_FUNC_(x) - first 60 bits of md5(x) as a bigint (portable hash).",
  examples = "> SELECT _FUNC_('a');")
case class PortableHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"portable_hash60 expects string or binary, got ${t.catalogString}")
  }

  private lazy val isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) PortableHash60.hashUtf8(input.asInstanceOf[UTF8String])
    else PortableHash60.hashBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("portableHash60Mod", PortableHash60,
      PortableHash60.getClass.getName)
    val call = if (isString) "hashUtf8" else "hashBytes"
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $mod.$call($x);")
  }

  override def prettyName: String = "portable_hash60"

  override protected def withNewChildInternal(newChild: Expression): PortableHash60 =
    copy(child = newChild)
}

object PortableHash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    // first 15 hex nibbles == the high 60 bits of the first 8 digest
    // bytes, big-endian
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)
}
