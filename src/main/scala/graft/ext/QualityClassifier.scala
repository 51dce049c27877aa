package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IN-ENGINE quality-classifier TRAINING (VERDICT r10 #3): real pipelines
  * do not just apply a quality gate — they DISTILL it into a fast linear
  * classifier over hashed token features and apply that at the corpus
  * scale the heuristic rules are too slow for. `Curation.logisticScore`
  * is the inference half; this is the missing training half.
  *
  * Model: linear score over hashed-unigram RELATIVE frequencies,
  *   z = b + Σ_j w_j · (count_j / n_tokens),
  * squashed by the RATIONAL fast sigmoid p = 0.5 + z / (2(1+|z|)) —
  * the published division-only logistic surrogate. Rational-only on
  * purpose (the q184/q42 family): no exp/log means no libm parity risk,
  * so full batch gradient descent is DuckDB-twinnable end to end.
  *
  * Training: `iters` unrolled batch-GD steps, w ← w − lr·G/n with
  * G_j = Σ_i (p_i − y_i)·x_ij. Cross-engine exactness comes from the
  * house discipline:
  *  - the per-doc contributions p·x and (p−y)² are QUANTIZED to integer
  *    micro-units (round(v·1e6), non-negative by construction — the
  *    engines agree on non-negative HALF_UP) and summed as longs, so
  *    every aggregate is order-independent;
  *  - the driver computes the weight update from those integer sums
  *    through a FIXED-SHAPE double chain ((P−Y)/1e6)/n, the same chain
  *    the oracle's unrolled CTEs evaluate — by induction every w_k is
  *    bit-identical, hence every z, p and loss is too;
  *  - lr = 0.5 is binary-exact; z is a LEFT-ASSOCIATED sum starting at
  *    the bias, matching SQL's natural + associativity.
  *
  * Driver state is 2·(nBuckets+1) longs per pass — bounded; each pass is
  * one scan-side aggregation (no shuffle beyond the final 1-row agg), so
  * the whole training is iters+1 linear passes at any corpus size.
  */
object QualityClassifier {

  /** One GD snapshot: weights AFTER `iter` updates and the quantized
    * squared-residual loss Σ round((p−y)²·1e6) UNDER those weights.
    */
  final case class Step(iter: Int, lossQ: Long, bias: Double,
      weights: Array[Double])

  /** Dense scan-side training readout: one row per iteration 0..iters
    * with (iter, loss_q, b, w0..w{nBuckets-1}). `portable` selects the
    * md5-twin token hash (oracle form) vs xxhash64 (production).
    */
  def trainDense(docs: DataFrame, textCol: String, labelCol: Column,
      nBuckets: Int = 16, iters: Int = 3, lr: Double = 0.5,
      portable: Boolean = true): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 64,
      "dense form is for demo-width buckets; use trainSparse beyond")
    val spark = docs.sparkSession
    val steps = fit(docs, textCol, labelCol, nBuckets, iters, lr, portable)
    val rows = steps.map { st =>
      org.apache.spark.sql.Row.fromSeq(
        st.iter.toLong +: st.lossQ +: st.bias +: st.weights.toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("iter",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      org.apache.spark.sql.types.StructField("loss_q",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.DoubleType, nullable = false) +:
      (0 until nBuckets).map(j =>
        org.apache.spark.sql.types.StructField(s"w$j",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The GD loop itself; returns iters+1 snapshots (iter 0 = zero
    * weights). Each pass aggregates the quantized sufficient stats and
    * the driver applies the fixed-shape update.
    */
  def fit(docs: DataFrame, textCol: String, labelCol: Column,
      nBuckets: Int, iters: Int, lr: Double,
      portable: Boolean): Seq[Step] = {
    val feat = featurize(docs, textCol, labelCol, nBuckets, portable)
      .localCheckpoint() // iters+1 consumers; regex+hash run once

    var b = 0.0
    var w = Array.fill(nBuckets)(0.0)
    val out = Seq.newBuilder[Step]
    for (k <- 0 to iters) {
      // z left-associated from the bias — the SQL + chain shape
      val z = (0 until nBuckets).foldLeft(lit(b): Column) {
        case (acc, j) => acc + lit(w(j)) * col(s"x$j")
      }
      val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
      val r = p - col("y").cast("double")
      val aggs =
        sum(round(r * r * lit(1000000.0)).cast("long")).as("loss") +:
        count(lit(1L)).as("n") +:
        sum(round(p * lit(1000000.0)).cast("long")).as("pb") +:
        sum(col("y") * lit(1000000L)).as("yb") +:
        (0 until nBuckets).flatMap(j => Seq(
          sum(round(p * col(s"x$j") * lit(1000000.0)).cast("long"))
            .as(s"p$j"),
          sum(col("y") * round(col(s"x$j") * lit(1000000.0)).cast("long"))
            .as(s"y$j")))
      val row = feat.agg(aggs.head, aggs.tail: _*).collect()(0)
      out += Step(k, row.getAs[Long]("loss"), b, w.clone())
      if (k < iters) {
        val n = row.getAs[Long]("n")
        def grad(pSum: Long, ySum: Long): Double =
          ((pSum - ySum).toDouble / 1000000.0) / n.toDouble
        b = b - lr * grad(row.getAs[Long]("pb"), row.getAs[Long]("yb"))
        w = Array.tabulate(nBuckets)(j => w(j) -
          lr * grad(row.getAs[Long](s"p$j"), row.getAs[Long](s"y$j")))
      }
    }
    out.result()
  }

  /** Per-doc features: y (0/1 from labelCol), ntok, and x0..x{n-1} =
    * bucket-count / ntok as doubles. Bucket array is a MATERIALIZED
    * projection (the q84 rule) so the hash runs once per token.
    */
  private[graft] def featurize(docs: DataFrame, textCol: String,
      labelCol: Column, nBuckets: Int, portable: Boolean): DataFrame = {
    val hash: Column => Column =
      if (portable) t => Dedup.portableHash60(t) % nBuckets
      else t => pmod(xxhash64(t), lit(nBuckets.toLong))
    val base = docs
      .withColumn("_y01", when(labelCol, 1L).otherwise(0L))
      .withColumn("_bk",
        transform(TextAnalysis.tokens(lower(col(textCol))), hash))
      .withColumn("_ntok", size(col("_bk")))
      .filter(col("_ntok") >= 1)
    // features are bucket RELATIVE FREQUENCIES (Σ_j x_j = 1): the
    // simplex scaling keeps fixed-lr batch GD monotone (a mean-one
    // rescale was tried and made lr=0.5 overshoot into oscillation)
    base.select(
      col("_y01").as("y") +: col("_ntok").cast("long").as("ntok") +:
      (0 until nBuckets).map(j =>
        (size(filter(col("_bk"), v => v === j)).cast("double") /
          col("_ntok").cast("double")).as(s"x$j")): _*)
  }

  /** Production-shape sparse training for wide feature spaces: features
    * live as (doc, bucket, count) rows, weights as a small (bucket, w)
    * dimension BROADCAST-joined per pass — the shape that scales to 2^18
    * buckets where the dense column form cannot. xxhash64, rows-only
    * (the x256 channel); readout is (iter, loss_q, w_l1_q) with the
    * weight vector folded to an order-independent quantized L1 checksum.
    */
  def trainSparse(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, nBuckets: Int = 4096, iters: Int = 3,
      lr: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .withColumn("_y01", when(labelCol, 1L).otherwise(0L))
      .withColumn("_bk", transform(TextAnalysis.tokens(lower(col(textCol))),
        t => pmod(xxhash64(t), lit(nBuckets.toLong))))
      .withColumn("_ntok", size(col("_bk")))
      .filter(col("_ntok") >= 1)
      .select(col(idCol).as("_id"), col("_y01").as("y"),
        col("_ntok").cast("double").as("ntok"), col("_bk"))
    val pairs = base
      .select(col("_id"), col("y"), col("ntok"),
        explode(col("_bk")).as("bucket"))
      .groupBy("_id", "y", "ntok", "bucket")
      .agg(count(lit(1)).cast("double").as("cnt"))
      .localCheckpoint()

    var b = 0.0
    var w = Map.empty[Long, Double] // sparse: absent = 0.0
    val out = Seq.newBuilder[(Long, Long, Long)]
    for (k <- 0 to iters) {
      val wDf = broadcast(
        w.toSeq.toDF("bucket", "w"))
      val scored = pairs
        .join(wDf, Seq("bucket"), "left")
        .withColumn("_wx", coalesce(col("w"), lit(0.0)) *
          (col("cnt") / col("ntok")))
        .groupBy("_id", "y", "ntok")
        .agg(sum(col("_wx")).as("_dot"))
        .withColumn("z", lit(b) + col("_dot"))
        .withColumn("p",
          lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
      val lossRow = scored.agg(
        sum(round((col("p") - col("y")) * (col("p") - col("y")) *
          lit(1000000.0)).cast("long")).as("loss"),
        count(lit(1L)).as("n"),
        sum(round(col("p") * lit(1000000.0)).cast("long")).as("pb"),
        sum(col("y") * lit(1000000L)).as("yb")).collect()(0)
      val wl1 = w.values.map(v => math.round(math.abs(v) * 1000000.0)).sum
      out += ((k.toLong, lossRow.getAs[Long]("loss"), wl1))
      if (k < iters) {
        val n = lossRow.getAs[Long]("n")
        // per-bucket gradient sums ride the same quantized-long pattern
        val g = pairs
          .join(broadcast(scored.select(col("_id"), col("p"))), Seq("_id"))
          .groupBy("bucket")
          .agg(
            sum(round(col("p") * (col("cnt") / col("ntok")) *
              lit(1000000.0)).cast("long")).as("ps"),
            sum(col("y") * round((col("cnt") / col("ntok")) *
              lit(1000000.0)).cast("long")).as("ys"))
          .collect()
        b = b - lr * (((lossRow.getAs[Long]("pb") -
          lossRow.getAs[Long]("yb")).toDouble / 1000000.0) / n.toDouble)
        val upd = g.map { r =>
          val bk = r.getAs[Long]("bucket")
          val gj = ((r.getAs[Long]("ps") - r.getAs[Long]("ys")).toDouble /
            1000000.0) / n.toDouble
          bk -> (w.getOrElse(bk, 0.0) - lr * gj)
        }.toMap
        w = w ++ upd
      }
    }
    out.result().toDF("iter", "loss_q", "w_l1_q").orderBy("iter")
  }
}
