package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every token-level statistic of the
  * Gopher/Falcon repetition rules in ONE pass over a string array —
  * `struct(n_words, n_distinct, chars, top_cnt)`.
  *
  * The composable form evaluates four separate interpreted array
  * expressions per row (`size`, `array_distinct` materializing a second
  * string array, an `aggregate` length fold dispatching a lambda per
  * element, and the top-count channel) — ~4 passes and two array
  * allocations over 100M tokens at the 100× point. Here one hash-count
  * loop (the [[TopTokenCount]] table, extended with byte-length
  * accumulation) produces all four numbers; called from whole-stage
  * codegen via the module reference, no per-row allocation beyond the
  * 4-field row.
  *
  * Semantics pinned by the q84 oracle: null array → null; empty array →
  * (0, 0, 0, 0). `chars` counts CODE POINTS (matching `length()` on
  * UTF8 strings, which DuckDB's `len()` agrees with); null elements
  * count as one distinct zero-length token (the `array_distinct` +
  * `aggregate` behavior on containsNull inputs).
  */
@ExpressionDescription(
  usage = "_FUNC_(tokens) - struct(n_words, n_distinct, chars, top_cnt) of a string array in one pass.",
  examples = "> SELECT _FUNC_(array('a', 'bb', 'a'));")
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"token_stats expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("tokenStatsMod", TokenStats,
      TokenStats.getClass.getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $mod.compute($arr);")
  }

  override def prettyName: String = "token_stats"

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {

  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    if (n == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Array[Int]](Math.min(n * 2, 1 << 16))
    var best = 0
    var chars = 0L
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val key = if (w == null) TokenStats.NullKey else w
      if (w != null) chars += w.numChars()
      var c = counts.get(key)
      if (c == null) {
        c = new Array[Int](1)
        counts.put(key, c)
      }
      c(0) += 1
      if (c(0) > best) best = c(0)
      i += 1
    }
    new GenericInternalRow(
      Array[Any](n.toLong, counts.size.toLong, chars, best.toLong))
  }

  private val NullKey = UTF8String.fromString(" __graft_null__")
}
