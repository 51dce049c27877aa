package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bounded smallest-k aggregate over longs — the top-k counterpart of the
  * packed-long argmin trick (CLAUDE.md x214): where a per-key top-k would
  * otherwise be a window (`row_number` over a full shuffle-and-SORT of
  * every candidate row), this aggregate keeps the k smallest values in k
  * PRIMITIVE LONG buffer slots, so it plans as a plain codegen'd
  * HashAggregate with map-side combine — the exchange carries exactly k
  * longs per key per partition and nothing is ever sorted.
  *
  * (A TypedImperativeAggregate form was measured and REJECTED: object
  * buffers plan as ObjectHashAggregate, which falls back to SORT-based
  * aggregation past spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold = 128 distinct keys per partition — re-inheriting
  * the very sort this aggregate exists to delete.)
  *
  * Slots hold Long.MaxValue sentinels while unfilled; callers must
  * guarantee real values < Long.MaxValue (the pqKnnJoin packability check
  * bounds packed (dist, id) strictly below it). Update is the k-stage
  * sorted-insertion network `s_i' = min(s_i, max(s_{i-1}, v))`; merge is
  * the two-sorted-array selection identity
  * `m_i = min over a+b=i of max(L_a, R_b)` — O(k²) expression nodes
  * (~2.1k Least/Greatest at the k = 64 cap; codegen splits oversized
  * methods, and the r6 measurement at k = 32 kept the HashAggregate
  * plan AND beat the window fallback — see PqKnnSpec/PERF.md).
  *
  * Returns the k smallest values ascending (duplicates kept — pack a
  * tiebreaker into the low bits as the callers do). Empty input → empty
  * array. Nulls are skipped (a null inserts the no-op sentinel).
  */
case class TopKLongs(
    child: Expression,
    k: Int
) extends DeclarativeAggregate with UnaryLike[Expression] {

  require(k >= 1 && k <= 64, "top_k_longs supports 1 <= k <= 64")

  override def prettyName: String = "top_k_longs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"top_k_longs expects BIGINT, got ${t.catalogString}")
  }

  private val sentinel = Literal(Long.MaxValue)

  private lazy val slots: Seq[AttributeReference] =
    (1 to k).map(i => AttributeReference(s"s$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots

  override lazy val initialValues: Seq[Expression] = Seq.fill(k)(sentinel)

  // sorted-insertion network: v lands at its rank, everything larger
  // shifts one slot right, the old maximum falls off. A null input
  // inserts the sentinel, which displaces nothing.
  override lazy val updateExpressions: Seq[Expression] = {
    val v = coalesce(child, sentinel)
    slots.zipWithIndex.map { case (s, i) =>
      if (i == 0) least(s, v) else least(s, greatest(slots(i - 1), v))
    }
  }

  // i-th smallest of two sorted sentinel-padded k-arrays:
  // min over all splits a + b = i of max(L_a, R_b) (absent side = -inf)
  override lazy val mergeExpressions: Seq[Expression] =
    (1 to k).map { i =>
      val candidates =
        (0 to i).collect {
          case 0 => slots(i - 1).right
          case a if a == i => slots(i - 1).left
          case a => greatest(slots(a - 1).left, slots(i - a - 1).right)
        }
      least(candidates: _*)
    }

  override lazy val evaluateExpression: Expression =
    ArrayRemove(CreateArray(slots), sentinel)

  private def least(es: Expression*): Expression =
    if (es.length == 1) es.head else Least(es)
  private def greatest(es: Expression*): Expression =
    if (es.length == 1) es.head else Greatest(es)
  private def coalesce(es: Expression*): Expression = Coalesce(es)

  override protected def withNewChildInternal(newChild: Expression): TopKLongs =
    copy(child = newChild)
}
