package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full MinHash signature of a gram-hash
  * array in one fused loop.
  *
  * The composable form — `transform(sequence(0, n-1), i ->
  * array_min(transform(hs, h -> h*a_i + b_i)))` — is a nested higher-order
  * function: interpreted evaluation, `nHashes` intermediate arrays allocated
  * PER ROW, and `nHashes × |grams|` lambda dispatches. This expression keeps
  * identical values (same affine family, same wrap-on-overflow long
  * arithmetic) but runs the whole signature as one `long[nHashes]`
  * accumulator pass inside whole-stage codegen — per row it is a tight
  * multiply-add loop, no allocation beyond the output array.
  *
  * The affine constants are derived from SplitMix64 of the function index
  * (deterministic — signatures are stable across runs and engines).
  * `constBits < 64` confines constants to that many low bits for the
  * engine-portable oracle variant (whose `a·h + b` must stay exact in
  * engines that error on 64-bit overflow); 64 is the production family.
  *
  * Null/empty handling: null input → null; EMPTY input → null (a document
  * with no grams has no signature — callers drop those rows, matching the
  * behavior of the explode-based formulation which simply produced no row).
  */
@ExpressionDescription(
  usage = "_FUNC_(hashes, nHashes, constBits) - minhash signature array of a long-array of gram hashes.",
  examples = "> SELECT _FUNC_(array(CAST(7 AS BIGINT)), 4, 64);")
case class MinHashSignature(child: Expression, nHashes: Int, constBits: Int)
    extends UnaryExpression {

  require(nHashes > 0, "nHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects array<bigint>, got ${t.catalogString}")
  }

  @transient private lazy val consts = MinHashSignature.affineConsts(nHashes, constBits)
  @transient private lazy val as: Array[Long] = consts.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = consts.map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val sig = new Array[Long](nHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < nHashes) {
        val v = h * as(k) + bs(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$nHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hs.getLong($i);
         |    for (int $k = 0; $k < $nHashes; $k++) {
         |      long $v = $h * $aRef[$k] + $bRef[$k];
         |      if ($v < $sig[$k]) $sig[$k] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Deterministic odd multipliers/offsets for the affine minhash family
    * (SplitMix64 of the function index). `bits < 64` confines both constants
    * to that many low bits; at 64 the values are the full-range family
    * (overflow wraps, as designed).
    */
  def affineConsts(n: Int, bits: Int = 64): IndexedSeq[(Long, Long)] = {
    val mask = if (bits >= 64) -1L else (1L << bits) - 1
    (0 until n).map { i =>
      def mix(x0: Long): Long = {
        var z = x0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      ((mix(i.toLong * 2 + 1) & mask) | 1L, mix(i.toLong * 2 + 2) & mask)
    }
  }
}
