package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Argmax over a (double ordering, long id) pair with ties to the LOWEST
  * id — the hard-negative/1-NN reduction, as a DeclarativeAggregate whose
  * buffer is two PRIMITIVE slots (best ordering, best id). max(struct(…))
  * has no mutable hash buffer and plans as a SortAggregate that SORTS the
  * whole pair stream (75 of 95 s at the x214 100× point; q141's 400M-row
  * sort spills past the sandbox disk at 100×) — this form is a plain
  * codegen'd HashAggregate with map-side combine, so the O(n²) pair
  * stream is consumed where it is produced.
  *
  * Payload columns (labels etc.) are NOT carried — re-join them on the
  * returned id (one broadcast join against the id→payload table); that is
  * the price of primitive buffers and it is the right trade at pair-count
  * scale.
  *
  * Double semantics are IEEE `>` / `==` (not SQL struct ordering): with
  * NaN-free inputs the winners agree, and −0.0 vs 0.0 ties resolve to the
  * lower id — which matches the DuckDB twins' comparison semantics. Null
  * ordering values are skipped. An all-null group evaluates to
  * (−Infinity, Long.MaxValue) — filter on `id != Long.MaxValue` if that
  * case can occur.
  */
case class ArgMaxTiedLow(
    ord: Expression,
    id: Expression
) extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = id
  override def prettyName: String = "arg_max_tied_low"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"arg_max_tied_low expects (DOUBLE, BIGINT), got " +
          s"(${o.catalogString}, ${i.catalogString})")
    }

  private lazy val bOrd =
    AttributeReference("bOrd", DoubleType, nullable = false)()
  private lazy val bId =
    AttributeReference("bId", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bOrd, bId)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Double.NegativeInfinity), Literal(Long.MaxValue))

  private def better(
      newOrd: Expression, newId: Expression,
      curOrd: Expression, curId: Expression): Expression =
    And(And(IsNotNull(newOrd), IsNotNull(newId)),
      Or(GreaterThan(newOrd, curOrd),
        And(EqualTo(newOrd, curOrd), LessThan(newId, curId))))

  override lazy val updateExpressions: Seq[Expression] = {
    val cond = better(ord, id, bOrd, bId)
    Seq(If(cond, ord, bOrd), If(cond, id, bId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val cond = better(bOrd.right, bId.right, bOrd.left, bId.left)
    Seq(If(cond, bOrd.right, bOrd.left), If(cond, bId.right, bId.left))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("ord"), bOrd, Literal("id"), bId))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxTiedLow =
    copy(ord = newLeft, id = newRight)
}
