package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Jaccard similarity of two DISTINCT-element
  * arrays, |A∩B| / (|A|+|B|−|A∩B|).
  *
  * The composable form (`array_intersect` + sizes) materializes the
  * intersection array per pair; this expression only COUNTS membership —
  * one hash-set build, zero intermediate allocations beyond it. Codegen
  * emits a call to the static `compute` (whole-stage codegen around it
  * stays intact), with a primitive-long fast path for hashed-gram arrays.
  *
  * Inputs are expected element-distinct (graft's shingle/gram builders
  * guarantee it); value semantics then match the composable form exactly.
  * Empty∪empty → 0.0; null input → null.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - Jaccard similarity of two distinct-element arrays.")
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b => a match {
        case _: StringType | _: NumericType | BooleanType | DateType |
            TimestampType | TimestampNTZType =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"jaccard_similarity: unsupported element type ${a.catalogString}")
      }
      case _ => TypeCheckResult.TypeCheckFailure(
        "jaccard_similarity expects two arrays of the same atomic type, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private lazy val isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (isLong) JaccardSimilarity.computeLong(x, y)
    else JaccardSimilarity.computeGeneric(x, y,
      left.dataType.asInstanceOf[ArrayType].elementType)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isLong)
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.JaccardSimilarity.computeLong($x, $y);")
    else {
      val et = ctx.addReferenceObj("elemType",
        left.dataType.asInstanceOf[ArrayType].elementType)
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.JaccardSimilarity.computeGeneric(" +
          s"$x, $y, (org.apache.spark.sql.types.DataType) $et);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {

  /** Fast path: primitive longs, open-addressing set, no boxing. */
  def computeLong(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val (small, large) = if (na <= nb) (a, b) else (b, a)
    val ns = small.numElements(); val nl = large.numElements()
    val set = new org.apache.spark.util.collection.OpenHashSet[Long](
      math.max(ns * 2, 8))
    var i = 0
    while (i < ns) { set.add(small.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nl) {
      if (set.contains(large.getLong(i))) inter += 1
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Generic atomic types via boxed set. */
  def computeGeneric(a: ArrayData, b: ArrayData, et: DataType): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val set = new java.util.HashSet[Any](na * 2)
    var i = 0
    while (i < na) { set.add(a.get(i, et)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) {
      if (set.contains(b.get(i, et))) inter += 1
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
