package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fused SEEDED-RNG Poisson bootstrap aggregate — the production
  * `graft.analytics.Bootstrap.poisson` draw loop (per-partition SplitMix64
  * stream, Poisson(1) inverse-CDF weights via the shared 4096-cell
  * monotone table) as ONE imperative aggregate pass (VERDICT r7 #3: the
  * BootstrapPoissonAgg form applied to the seeded x41 channel).
  *
  * Why this beats the r1-r7 RDD loop on identical arithmetic: `.rdd`
  * deserializes every Tungsten row into a boxed external Row and the loop
  * allocated two scratch arrays per row; here update() reads the
  * InternalRow directly and reuses per-instance scratch. The draw stream
  * is UNCHANGED — state seeds as `seed ^ (pid · golden)` on the first row
  * of each partition (TaskContext.getPartitionId, one task = one
  * partition) and advances one SplitMix64 step per (row, replicate), so
  * weights are bit-identical to the RDD twin given identical partition
  * contents/order.
  *
  * Merge-order determinism: per-partition partials stay SEPARATE in the
  * buffer (pid → 2·k·nSim doubles) and eval() sums them in ASCENDING pid
  * order — double addition is not associative, so a fetch-order sum would
  * differ run-to-run in ulps. The RDD twin folds its collected partials
  * the same way (collect + sortBy pid), which is what lets BootstrapSpec
  * pin bit-identity. Buffer cost: one ~16·k·nSim-byte array per INPUT
  * partition held until the final merge — ~64 KB × partitions at k=4,
  * nSim=1000; bounded by parallelism, not rows.
  *
  * Output: struct<_acc: array<array<double>>, _w: array<array<double>>>
  * (k outer entries, nSim inner), W=0 replicates left at 0.0 — the
  * readout drops columns whose every replicate weight is ≤ 20, matching
  * the RDD twin.
  */
case class BootstrapSeededAgg(
    values: Seq[Expression],
    nSim: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[Integer, Array[Double]]] {

  BootstrapAggCommon.requireArgs("bootstrap_seeded_agg", nSim, values)

  override def children: Seq[Expression] = values
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("_acc",
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false), nullable = false),
    StructField("_w",
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    BootstrapAggCommon.checkHomogeneous(
      "bootstrap_seeded_agg", children, DoubleType)

  private val k = values.length

  @transient private lazy val wTab: Array[Byte] =
    graft.analytics.Bootstrap.poissonWTable
  // per-instance scratch + per-partition RNG state: update() runs
  // sequentially within a task and expression instances are per-task
  // (the DeterministicMode precedent); one task processes one partition,
  // so re-seeding on a pid change is exactly the RDD twin's
  // mapPartitionsWithIndex seeding
  @transient private lazy val rowVals: Array[Double] = new Array[Double](k)
  @transient private lazy val rowMask: Array[Double] = new Array[Double](k)
  @transient private var lastPid: Int = Int.MinValue
  @transient private var state: Long = 0L

  override def createAggregationBuffer(): java.util.TreeMap[Integer, Array[Double]] =
    new java.util.TreeMap[Integer, Array[Double]]()

  override def update(
      buf: java.util.TreeMap[Integer, Array[Double]],
      input: InternalRow): java.util.TreeMap[Integer, Array[Double]] = {
    val pid = TaskContext.getPartitionId()
    if (pid != lastPid) {
      lastPid = pid
      state = seed ^ (pid.toLong * 0x9E3779B97F4A7C15L)
    }
    var arr = buf.get(pid)
    if (arr == null) {
      arr = new Array[Double](2 * k * nSim)
      buf.put(pid, arr)
    }
    // per-row masked values: vm = value (0.0 when null), wm = 1.0
    // (0.0 when null) — a null column's replicate weight must stay 0 so
    // the readout can drop it, and the masked multiply below keeps that
    // without a per-(column, replicate) branch
    val vm = rowVals
    val wm = rowMask
    var ci = 0
    while (ci < k) {
      val v = values(ci).eval(input)
      if (v == null) { vm(ci) = 0.0; wm(ci) = 0.0 }
      else { vm(ci) = v.asInstanceOf[Double]; wm(ci) = 1.0 }
      ci += 1
    }
    val tab = wTab
    var st = state
    var r = 0
    // the accumulate is UNCONDITIONAL (the BootstrapPoissonAgg lesson: a
    // 63%-true `weight > 0` guard mispredicts its way to ~2× slowdown).
    // Adding wd·v with wd = 0 is BIT-IDENTICAL to skipping FOR FINITE v:
    // the addend is ±0.0, and x + (±0.0) == x for every x except -0.0 —
    // which no accumulator can become (they start at +0.0 and
    // (+0.0) + (-0.0) is +0.0). PRECONDITION: values must be finite —
    // a ±Infinity/NaN row would contribute 0.0·Inf = NaN even to
    // replicates that drew weight 0, diverging from the guarded twin.
    // Upstream (Bootstrap.cleanNumeric) null-drops and the generators
    // never emit non-finite values; AnalyticsGoldenSpec's RDD-twin
    // bit-identity test pins the finite-input equivalence.
    if (k == 4) {
      // specialized hot loop: scalarized values/masks, no inner ci loop
      val v0 = vm(0); val v1 = vm(1); val v2 = vm(2); val v3 = vm(3)
      val m0 = wm(0); val m1 = wm(1); val m2 = wm(2); val m3 = wm(3)
      val n2 = 2 * nSim; val n3 = 3 * nSim
      val n4 = 4 * nSim; val n5 = 5 * nSim; val n6 = 6 * nSim
      val n7 = 7 * nSim
      while (r < nSim) {
        st += 0x9E3779B97F4A7C15L
        var z = st
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val u = (z >>> 11) * 1.1102230246251565e-16 // 2^-53
        var weight = tab((u * 4096.0).toInt).toInt
        if (weight < 0) weight = graft.analytics.Bootstrap.poissonInvWalk(u)
        val wd = weight.toDouble
        arr(r) += wd * v0
        arr(nSim + r) += wd * v1
        arr(n2 + r) += wd * v2
        arr(n3 + r) += wd * v3
        arr(n4 + r) += wd * m0
        arr(n5 + r) += wd * m1
        arr(n6 + r) += wd * m2
        arr(n7 + r) += wd * m3
        r += 1
      }
    } else {
      while (r < nSim) {
        // SplitMix64 step — the exact RDD-twin stream
        st += 0x9E3779B97F4A7C15L
        var z = st
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val u = (z >>> 11) * 1.1102230246251565e-16 // 2^-53
        var weight = tab((u * 4096.0).toInt).toInt
        if (weight < 0) weight = graft.analytics.Bootstrap.poissonInvWalk(u)
        val wd = weight.toDouble
        ci = 0
        while (ci < k) {
          arr(ci * nSim + r) += wd * vm(ci)
          arr((k + ci) * nSim + r) += wd * wm(ci)
          ci += 1
        }
        r += 1
      }
    }
    state = st
    buf
  }

  override def merge(
      a: java.util.TreeMap[Integer, Array[Double]],
      b: java.util.TreeMap[Integer, Array[Double]]): java.util.TreeMap[Integer, Array[Double]] =
    BootstrapAggCommon.mergePidPartials(a, b)

  override def eval(buf: java.util.TreeMap[Integer, Array[Double]]): Any = {
    // ascending-pid fold (TreeMap iterates sorted): deterministic double
    // summation order regardless of shuffle fetch order
    val acc = new Array[Double](k * nSim)
    val wts = new Array[Double](k * nSim)
    val it = buf.values().iterator()
    while (it.hasNext) {
      val arr = it.next()
      var i = 0
      while (i < k * nSim) {
        acc(i) += arr(i)
        wts(i) += arr(k * nSim + i)
        i += 1
      }
    }
    def nested(flat: Array[Double]): GenericArrayData =
      new GenericArrayData(Array.tabulate[Any](k) { ci =>
        new GenericArrayData(
          java.util.Arrays.copyOfRange(flat, ci * nSim, (ci + 1) * nSim))
      })
    new GenericInternalRow(Array[Any](nested(acc), nested(wts)))
  }

  override def serialize(buf: java.util.TreeMap[Integer, Array[Double]]): Array[Byte] =
    BootstrapAggCommon.pidPartialsToBytes(buf, 2 * k * nSim)

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Integer, Array[Double]] =
    BootstrapAggCommon.bytesToPidPartials(bytes, 2 * k * nSim)

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapSeededAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapSeededAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BootstrapSeededAgg =
    copy(values = newChildren)
}
