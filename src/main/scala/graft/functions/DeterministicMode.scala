package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Custom aggregate: mode with the pandas tie-break.
  *
  * `Series.mode()` sorts its result, and the reference always takes
  * `.iloc[0]` (clean_traffic.py:89-95) — so ties resolve to the SMALLEST
  * value. Spark's built-in `mode` breaks ties arbitrarily, which is
  * unacceptable for golden reproducibility; this TypedImperativeAggregate
  * keeps (value → count) state with proper partial aggregation (map-side
  * combine, mergeable buffers), then picks (max count, min value).
  *
  * Usage: SQL `mode_det(col)` (registered via GraftExtensions) or
  * `GraftFunctions.modeDet(col)`. The multi-column melt in
  * graft.etl.Cleaning.modes has the same semantics for the fused path.
  */
@ExpressionDescription(
  usage = "_FUNC_(col) - most frequent non-null value; ties break to the smallest value.")
case class DeterministicMode(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | _: NumericType | BooleanType | DateType |
        TimestampType | TimestampNTZType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"mode_det does not support ${t.catalogString}")
  }

  private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy unsafe-backed values (e.g. UTF8String pointing into the row)
      val key = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case x => x
      }
      buffer.update(key, buffer.getOrElse(key, 0L) + 1L)
    }
    buffer
  }

  override def merge(
      a: mutable.HashMap[Any, Long], b: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    a
  }

  override def eval(buffer: mutable.HashMap[Any, Long]): Any =
    if (buffer.isEmpty) null
    else
      buffer.foldLeft(null.asInstanceOf[Any] -> -1L) {
        case ((bestV, bestC), (v, c)) =>
          if (c > bestC ||
            (c == bestC && ordering.compare(v, bestV) < 0)) (v, c)
          else (bestV, bestC)
      }._1

  override def serialize(buffer: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeInt(buffer.size)
    buffer.foreach { case (k, v) => oos.writeObject(k); oos.writeLong(v) }
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val m = mutable.HashMap.empty[Any, Long]
    (0 until n).foreach { _ =>
      val k = ois.readObject(); val v = ois.readLong(); m.update(k, v)
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DeterministicMode =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DeterministicMode =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DeterministicMode =
    copy(child = newChildren.head)
}
