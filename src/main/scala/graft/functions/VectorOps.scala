package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the wide-vector hot paths.
  *
  * The composable forms in `graft.ext.Similarity` (`aggregate` over
  * `zip_with` inside `when`, once per plane/centroid) are NESTED
  * higher-order functions: they evaluate interpreted, allocate an
  * intermediate array per plane/centroid PER ROW, and re-evaluate the
  * quantization transform once per centroid reference. At dim=1024 that
  * measured 136 µs/row (SRP bucket, 16 planes) and 225 µs/row (IVF assign,
  * 8 cells) against 29 µs/row for the native fused cosine — these
  * expressions close that gap with one tight codegen'd loop and zero
  * per-row allocation.
  *
  * Bit-identity with the composable forms is part of the contract (the
  * q70/q72/q75 oracles pin it): same sequential double accumulation, the
  * sign test uses Spark's SQL ordering (`Double.compare`, so NaN ≥ 0 and
  * -0.0 < 0 behave exactly like the `>=` predicate), ties and degenerate
  * inputs reproduce the `when`/null-propagation behavior (length-mismatch
  * → bucket 0 / cell -1, null array → null).
  */
object VectorOps {

  /** Evaluate a FOLDABLE array<array<double>> argument at build time. */
  private[functions] def foldableMatrix(e: Expression): IndexedSeq[IndexedSeq[Double]] = {
    require(e.foldable, s"expected a literal plane/centroid matrix, got $e")
    val rows = e.eval().asInstanceOf[ArrayData]
    require(rows != null && rows.numElements() > 0, "matrix must be non-empty")
    (0 until rows.numElements()).map { i =>
      val r = rows.getArray(i)
      (0 until r.numElements()).map(r.getDouble).toIndexedSeq
    }.toIndexedSeq
  }

  private[functions] def foldableLongMatrix(e: Expression): IndexedSeq[IndexedSeq[Long]] = {
    require(e.foldable, s"expected a literal centroid matrix, got $e")
    val rows = e.eval().asInstanceOf[ArrayData]
    require(rows != null && rows.numElements() > 0, "matrix must be non-empty")
    (0 until rows.numElements()).map { i =>
      val r = rows.getArray(i)
      (0 until r.numElements()).map(r.getLong).toIndexedSeq
    }.toIndexedSeq
  }
}

/** `srp_bucket(vec, planes)` — sign-random-projection bucket id: bit i of
  * the result is set iff `dot(vec, planes[i]) >= 0` (Spark SQL double
  * ordering). One fused loop over all planes; the plane matrix rides the
  * expression as data (rendered as a shape tag in plans, not 16k literals).
  */
@ExpressionDescription(
  usage = "_FUNC_(vec, planes) - SRP LSH bucket id of a numeric array.")
case class SrpBucket(child: Expression, planes: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63, "1..63 planes (long bucket)")
  require(planes.forall(_.size == planes.head.size),
    "planes must share one dimension")

  private val nBits = planes.size
  private val dim = planes.head.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects array<float|double>, got ${t.catalogString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Row-major flattened planes for the codegen reference object. */
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nBits * dim)
    var b = 0
    while (b < nBits) {
      var j = 0
      while (j < dim) { a(b * dim + j) = planes(b)(j); j += 1 }
      b += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return 0L // mismatch → null dots → all bits 0
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var j = 0
      while (j < dim) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += x * flat(b * dim + j)
        j += 1
      }
      if (java.lang.Double.compare(dot, 0.0) >= 0) bucket |= 1L << b
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("srpPlanes", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |if ($v.numElements() == $dim) {
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += (double) $v.$get($j) * $p[$b * $dim + $j];
         |    }
         |    if (java.lang.Double.compare($dot, 0.0) >= 0) $bucket |= 1L << $b;
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  // keep the 16k-double payload OUT of plan renderings — print its shape
  override def toString: String = s"srp_bucket($child, <${nBits}x$dim planes>)"
  override def sql: String = s"srp_bucket(${child.sql}, <${nBits}x$dim planes>)"

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** `srp_bucket_q(quantized_vec, planes)` — the engine-portable quantized
  * sign-random-projection bucket over LONG planes: bit i set iff
  * Σ_j vq(j)·w(i)(j) > 0, exact wrapping long arithmetic.
  *
  * Replaces the composable nested-HOF form (aggregate over bits with an
  * inner zip_with dot product), which ran fully interpreted and
  * re-evaluated its inline quantized-array argument per BIT (r11: the two
  * single-task 0.75 s bucket projections of q77 at sf0.1). Degenerate
  * inputs replicate the HOF form exactly: null array → null; any null
  * element or a length ≠ the planes' dim → every per-bit sum is null →
  * no bit set → bucket 0.
  */
@ExpressionDescription(
  usage = "_FUNC_(vec, planes) - quantized SRP bucket over long planes.")
case class SrpBucketQ(child: Expression, planes: IndexedSeq[IndexedSeq[Long]])
    extends UnaryExpression {

  require(planes.nonEmpty, "need at least one plane")
  require(planes.forall(_.size == planes.head.size),
    "planes must share one dimension")

  private val nBits = planes.size
  private val dim = planes.head.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket_q expects array<bigint> (quantized), got ${t.catalogString}")
  }

  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](nBits * dim)
    var b = 0
    while (b < nBits) {
      var j = 0
      while (j < dim) { a(b * dim + j) = planes(b)(j); j += 1 }
      b += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bad = n != dim
    var j = 0
    while (!bad && j < n) { if (v.isNullAt(j)) bad = true; j += 1 }
    if (bad) return 0L
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var d = 0L
      var i = 0
      while (i < dim) { d += v.getLong(i) * flat(b * dim + i); i += 1 }
      if (d > 0L) bucket += (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("srpQPlanes", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bucket = ctx.freshName("bucket")
      s"""
         |boolean $bad = $v.numElements() != $dim;
         |for (int $j = 0; !$bad && $j < $dim; $j++) {
         |  if ($v.isNullAt($j)) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.value} = 0L;
         |} else {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    long $d = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $d += $v.getLong($i) * $pRef[$b * $dim + $i];
         |    }
         |    if ($d > 0L) $bucket += (1L << $b);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })
  }

  override def toString: String = s"srp_bucket_q($child, <${nBits}x$dim planes>)"
  override def sql: String = s"srp_bucket_q(${child.sql}, <${nBits}x$dim planes>)"

  override protected def withNewChildInternal(newChild: Expression): SrpBucketQ =
    copy(child = newChild)
}

/** `ivf_argmin(quantized_vec, centroids)` — index of the nearest centroid by
  * exact integer squared-L2 over `round(v·1000)`-quantized longs; ties break
  * to the LOWEST index (strict `<` against the best-so-far). Degenerate
  * inputs reproduce the composable form: length mismatch or a null element
  * → every distance is null → -1; null array → null.
  */
@ExpressionDescription(
  usage = "_FUNC_(vec, centroids) - nearest-centroid index over quantized longs.")
case class IvfArgMin(child: Expression, centroids: IndexedSeq[IndexedSeq[Long]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.size == centroids.head.size),
    "centroids must share one dimension")

  private val k = centroids.size
  private val dim = centroids.head.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_argmin expects array<bigint> (quantized), got ${t.catalogString}")
  }

  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](k * dim)
    var c = 0
    while (c < k) {
      var j = 0
      while (j < dim) { a(c * dim + j) = centroids(c)(j); j += 1 }
      c += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bad = n != dim
    var j = 0
    while (!bad && j < n) { if (v.isNullAt(j)) bad = true; j += 1 }
    if (bad) return -1L
    var best = Long.MaxValue
    var bi = -1L
    var c = 0
    while (c < k) {
      var d = 0L
      var i = 0
      while (i < dim) {
        val t = v.getLong(i) - flat(c * dim + i)
        d += t * t
        i += 1
      }
      if (d < best) { best = d; bi = c.toLong }
      c += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      s"""
         |boolean $bad = $v.numElements() != $dim;
         |for (int $j = 0; !$bad && $j < $dim; $j++) {
         |  if ($v.isNullAt($j)) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.value} = -1L;
         |} else {
         |  long $best = Long.MAX_VALUE; long $bi = -1L;
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $d = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      long $t = $v.getLong($i) - $cRef[$c * $dim + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bi = (long) $c; }
         |  }
         |  ${ev.value} = $bi;
         |}
       """.stripMargin
    })
  }

  override def toString: String = s"ivf_argmin($child, <${k}x$dim centroids>)"
  override def sql: String = s"ivf_argmin(${child.sql}, <${k}x$dim centroids>)"

  override protected def withNewChildInternal(newChild: Expression): IvfArgMin =
    copy(child = newChild)
}

/** `ivf_topcells(quantized_vec, centroids, nProbe)` — the `nProbe` nearest
  * centroid indices by exact integer squared-L2 over `round(v·1000)`-
  * quantized longs, ordered by (distance ASC, index ASC) — the multi-cell
  * IVF probe routing for batch ANN joins ([[graft.ext.Similarity.pqKnnJoin]]).
  * Ties break to the LOWEST index (insertion uses strict `<` against each
  * slot, and indices are visited ascending). Degenerate inputs: length
  * mismatch or a null element → EMPTY array (so a downstream `explode`
  * yields no probe rows); null array → null.
  */
@ExpressionDescription(
  usage = "_FUNC_(vec, centroids, nProbe) - nProbe nearest-centroid indices.")
case class IvfTopCells(
    child: Expression,
    centroids: IndexedSeq[IndexedSeq[Long]],
    nProbe: Int
) extends UnaryExpression {

  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.forall(_.size == centroids.head.size),
    "centroids must share one dimension")
  require(nProbe >= 1 && nProbe <= centroids.size,
    "nProbe must be in [1, #centroids]")

  private val k = centroids.size
  private val dim = centroids.head.size

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_topcells expects array<bigint> (quantized), got ${t.catalogString}")
  }

  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](k * dim)
    var c = 0
    while (c < k) {
      var j = 0
      while (j < dim) { a(c * dim + j) = centroids(c)(j); j += 1 }
      c += 1
    }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bad = n != dim
    var j = 0
    while (!bad && j < n) { if (v.isNullAt(j)) bad = true; j += 1 }
    if (bad)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Long](0))
    val bd = new Array[Long](nProbe)
    val bi = new Array[Long](nProbe)
    java.util.Arrays.fill(bd, Long.MaxValue)
    java.util.Arrays.fill(bi, -1L)
    var c = 0
    while (c < k) {
      var d = 0L
      var i = 0
      while (i < dim) {
        val t = v.getLong(i) - flat(c * dim + i)
        d += t * t
        i += 1
      }
      // strict < keeps earlier (lower) indices ahead on distance ties
      var p = nProbe
      while (p > 0 && d < bd(p - 1)) p -= 1
      if (p < nProbe) {
        var q = nProbe - 1
        while (q > p) { bd(q) = bd(q - 1); bi(q) = bi(q - 1); q -= 1 }
        bd(p) = d
        bi(p) = c.toLong
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", flat, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      s"""
         |boolean $bad = $v.numElements() != $dim;
         |for (int $j = 0; !$bad && $j < $dim; $j++) {
         |  if ($v.isNullAt($j)) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $bd = new long[$nProbe];
         |  long[] $bi = new long[$nProbe];
         |  java.util.Arrays.fill($bd, Long.MAX_VALUE);
         |  java.util.Arrays.fill($bi, -1L);
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $d = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      long $t = $v.getLong($i) - $cRef[$c * $dim + $i];
         |      $d += $t * $t;
         |    }
         |    int $p = $nProbe;
         |    while ($p > 0 && $d < $bd[$p - 1]) $p--;
         |    if ($p < $nProbe) {
         |      for (int $q = $nProbe - 1; $q > $p; $q--) {
         |        $bd[$q] = $bd[$q - 1]; $bi[$q] = $bi[$q - 1];
         |      }
         |      $bd[$p] = $d;
         |      $bi[$p] = (long) $c;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
         |}
       """.stripMargin
    })
  }

  override def toString: String =
    s"ivf_topcells($child, <${k}x$dim centroids>, $nProbe)"
  override def sql: String =
    s"ivf_topcells(${child.sql}, <${k}x$dim centroids>, $nProbe)"

  override protected def withNewChildInternal(newChild: Expression): IvfTopCells =
    copy(child = newChild)
}
