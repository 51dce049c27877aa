package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-pattern OVERLAPPING substring
  * occurrence counts of a fixed pattern set in one text pass — the
  * Aho-Corasick automaton (1975), the multi-pattern scan every
  * blocklist/PII curation stage needs at lake scale.
  *
  * Why native: `contains`/`regexp_count` per pattern is one full text
  * scan PER PATTERN (and a regex alternation still backtracks per
  * position); Aho-Corasick is ONE pass over the text regardless of
  * pattern count — goto/fail transitions plus dictionary-suffix output
  * links, so patterns nested inside other patterns ("a" in "table")
  * and overlapping self-matches are all counted. The automaton rides
  * the expression as a payload (the SrpBucket pattern): the registered
  * function's literal pattern array is consumed at analysis time.
  *
  * Returns `array<long>` of counts ordered as the pattern list (null
  * text → null). The q244 DuckDB twin brute-forces the same overlapping
  * semantics per (position, pattern) — a drift in fail links, output
  * links, or overlap handling breaks the hash.
  */
@ExpressionDescription(
  usage = "_FUNC_(text, patterns) - overlapping occurrence count per pattern, one Aho-Corasick pass.",
  examples = "> SELECT _FUNC_('ushers', array('he', 'she', 'his', 'hers'));")
case class MultiPatternCounts(child: Expression, automaton: AcAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_counts expects a string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MultiPatternCounts.compute(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = ctx.addReferenceObj("acMod", MultiPatternCounts,
      MultiPatternCounts.getClass.getName)
    val a = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $mod.compute($t, $a);")
  }

  override def prettyName: String = "multi_pattern_counts"
  override def toString: String =
    s"multi_pattern_counts($child, ${automaton.tag})"
  override def sql: String =
    s"multi_pattern_counts(${child.sql}, ${automaton.tag})"

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCounts = copy(child = newChild)
}

/** The built automaton: per-node char→node goto maps, fail links, and
  * TRANSITIVELY RESOLVED output lists (own pattern plus every pattern
  * ending at a dictionary suffix — resolved once at build, so the scan
  * never walks fail chains for output).
  *
  * `asciiDelta` is the ASCII (< 128) slice converted to a FULL DFA at
  * build time (fail transitions baked in, BFS order), so the hot scan
  * does one unboxed array load per ASCII char — no Character boxing, no
  * HashMap probe, no fail-walk. Codepoints ≥ 128 take the goto-map +
  * fail-link path; both paths land in the same state set, so mixing is
  * seamless.
  */
final class AcAutomaton(
    val next: Array[java.util.HashMap[Character, Integer]],
    val fail: Array[Int],
    val out: Array[Array[Int]],
    val asciiDelta: Array[Array[Int]],
    val nPatterns: Int
) extends Serializable {
  def tag: String = s"<ac ${next.length}n/${nPatterns}p>"
}

object MultiPatternCounts {

  /** Standard Aho-Corasick construction: trie, BFS fail links,
    * output(n) = own ∪ output(fail(n)).
    */
  def build(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "multi_pattern_counts: non-empty pattern list of non-empty patterns")
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val t = next(s).get(c)
        if (t == null) {
          next += new java.util.HashMap[Character, Integer]()
          ownOut += Nil
          next(s).put(c, next.length - 1)
          s = next.length - 1
        } else s = t.intValue
      }
      ownOut(s) = pi :: ownOut(s)
    }
    val n = next.length
    val fail = new Array[Int](n)
    val outList = ownOut.map(_.reverse.toList).toArray
    val bfsOrder = scala.collection.mutable.ArrayBuffer[Int]()
    val queue = scala.collection.mutable.Queue[Int]()
    next(0).forEach { (_, t) => queue.enqueue(t.intValue) }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      bfsOrder += s
      next(s).forEach { (c, t) =>
        queue.enqueue(t.intValue)
        var f = fail(s)
        while (f != 0 && next(f).get(c) == null) f = fail(f)
        val g = next(f).get(c)
        fail(t.intValue) =
          if (g != null && g.intValue != t.intValue) g.intValue else 0
        ()
      }
      outList(s) = outList(s) ++ outList(fail(s))
    }
    // ASCII slice as a full DFA: delta(s)(c) = goto if present, else
    // delta(fail(s))(c) — fail(s) is strictly shallower, so BFS order
    // guarantees it is already filled.
    val asciiDelta = Array.ofDim[Int](n, 128)
    var c = 0
    while (c < 128) {
      val g0 = next(0).get(Character.valueOf(c.toChar))
      asciiDelta(0)(c) = if (g0 == null) 0 else g0.intValue
      c += 1
    }
    bfsOrder.foreach { s =>
      val df = asciiDelta(fail(s))
      var ci = 0
      while (ci < 128) {
        val g = next(s).get(Character.valueOf(ci.toChar))
        asciiDelta(s)(ci) = if (g == null) df(ci) else g.intValue
        ci += 1
      }
    }
    new AcAutomaton(next.toArray, fail,
      outList.map(_.toArray), asciiDelta, patterns.length)
  }

  /** One pass; counts ALL (overlapping) occurrences per pattern. ASCII
    * chars take the baked-in DFA row (one array load, no boxing); chars
    * ≥ 128 take the goto-map + fail-link walk.
    */
  def compute(text: UTF8String, a: AcAutomaton): GenericArrayData = {
    val t = text.toString
    val counts = new Array[Long](a.nPatterns)
    val delta = a.asciiDelta
    val len = t.length
    var s = 0
    var i = 0
    while (i < len) {
      val ch = t.charAt(i)
      if (ch < 128) {
        s = delta(s)(ch)
      } else {
        val c = Character.valueOf(ch)
        var g = a.next(s).get(c)
        while (s != 0 && g == null) { s = a.fail(s); g = a.next(s).get(c) }
        s = if (g == null) 0 else g.intValue
      }
      val o = a.out(s)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
