package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: DISTINCT hashes of the word n-grams of a
  * token array, in one fused pass.
  *
  * The composable form — `array_distinct(transform(sequence(1, len-n+1),
  * i -> concat_ws(' ', slice(toks, i, n))))` followed by `xxhash64` per
  * exploded gram — materializes one ~30-byte gram STRING per window and
  * runs the window transform as an interpreted higher-order function
  * (HOFs never codegen). Here each token is hashed ONCE (XXH64 over its
  * UTF8 bytes, the same kernel as Spark's xxhash64), windows combine by a
  * wrapping polynomial roll (2 multiply-adds per gram), and first-
  * occurrence dedup runs on an open-addressed long table — no gram
  * strings, no per-window allocation.
  *
  * The hash family differs from xxhash64-of-the-gram-string, which is
  * fine for every consumer by construction: decontamination/overlap
  * counts are hash-function-INDEPENDENT (both join sides come from this
  * same expression; a false overlap needs a 64-bit collision, ~1e-15 at
  * corpus scale), which is also what lets q79 oracle the counts against
  * DuckDB's string-gram twin.
  *
  * Degenerate cases follow [[graft.ext.Dedup.wordNgrams]]: null input →
  * null; zero tokens → empty array; fewer than n tokens → ONE gram (the
  * whole token sequence). Null tokens hash as empty strings.
  */
@ExpressionDescription(
  usage = "_FUNC_(tokens, n) - distinct 64-bit hashes of the word n-grams of a string array.",
  examples = "> SELECT _FUNC_(array('a', 'b', 'c'), 2);")
case class WordGramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "word_gram_hashes needs n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"word_gram_hashes expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordGramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("wordGramHashesMod", WordGramHashes,
      WordGramHashes.getClass.getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $mod.compute($arr, $n);")
  }

  override def prettyName: String = "word_gram_hashes"

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)
}

object WordGramHashes {

  private val Prime = 1000003L
  private val Seed = 42L

  def compute(tokens: ArrayData, n: Int): GenericArrayData = {
    val len = tokens.numElements()
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    // hash every token once
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      val t = tokens.getUTF8String(i)
      th(i) =
        if (t == null) XXH64.hashInt(0, Seed)
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    if (len < n) {
      // one gram: the whole token sequence
      var h = 0L
      i = 0
      while (i < len) { h = h * Prime + th(i); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val nGrams = len - n + 1
    val out = new Array[Long](nGrams)
    var outLen = 0
    // open-addressed dedup table (0 keyed via a seen-zero flag)
    val cap = java.lang.Integer.highestOneBit(Math.max(4, nGrams * 2 - 1)) << 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var k = 0
      while (k < n) { h = h * Prime + th(g + k); k += 1 }
      // probe
      var slot = (java.lang.Long.hashCode(h) & 0x7fffffff) & mask
      var dup = false
      var done = false
      while (!done) {
        if (!used(slot)) { used(slot) = true; table(slot) = h; done = true }
        else if (table(slot) == h) { dup = true; done = true }
        else slot = (slot + 1) & mask
      }
      if (!dup) { out(outLen) = h; outLen += 1 }
      g += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }
}
