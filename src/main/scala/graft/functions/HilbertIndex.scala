package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the Hilbert-curve index of a 2-D point on
  * the 65536×65536 grid (16 bits per dimension → d in [0, 2^32)).
  *
  * Why a second space-filling curve next to `LakeOps.zvalue2` (Morton):
  * the Hilbert curve has strictly better locality — consecutive d values
  * are ALWAYS adjacent cells (Morton jumps across the grid at quadrant
  * seams), so equal-width d-ranges cut files with tighter per-dimension
  * min/max boxes and a data-skipping scan prunes more files for the same
  * box predicate (q242 measures both layouts side by side).
  *
  * The index is the classical quadrant-rotation walk (Hilbert 1891; the
  * xy2d formulation): 16 rounds of pure integer shift/mask/flip/swap —
  * no floating point, no tables — so a DuckDB oracle can replay the SAME
  * 16 rounds as chained CTEs and hash-match exactly. The loop lives in
  * the companion (compiled JVM code called from generated code, the
  * TopTokenCount pattern); inputs are masked to 16 bits, so any long is
  * accepted.
  */
@ExpressionDescription(
  usage = "_FUNC_(x, y) - Hilbert curve index of (x & 0xFFFF, y & 0xFFFF) on the 2^16 grid.",
  examples = "> SELECT _FUNC_(3, 4);")
case class HilbertIndex2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) | (IntegerType, IntegerType) |
          (LongType, IntegerType) | (IntegerType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert_index expects integral arguments, got " +
            s"${l.catalogString}, ${r.catalogString}")
    }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex2.compute(asLong(left, x), asLong(right, y))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("hilbertIndexMod", HilbertIndex2,
      HilbertIndex2.getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (x, y) => s"${ev.value} = $mod.compute((long) $x, (long) $y);")
  }

  override def prettyName: String = "hilbert_index"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2 =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {

  /** xy → d on the order-16 Hilbert curve. For s = 2^15 … 2^0: take the
    * quadrant bit pair (rx, ry), add its Gray-coded quadrant index times
    * s², then rotate/flip the low half-plane so the next round sees the
    * sub-curve in canonical orientation. Integer-only — the q242 DuckDB
    * twin unrolls these exact 16 rounds as CTEs.
    */
  def compute(xIn: Long, yIn: Long): Long = {
    var x = (xIn & 0xffffL).toInt
    var y = (yIn & 0xffffL).toInt
    var d = 0L
    var s = 1 << 15
    while (s > 0) {
      val rx = if ((x & s) != 0) 1 else 0
      val ry = if ((y & s) != 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535 - x; y = 65535 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
