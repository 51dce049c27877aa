package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-engine classifier training: GD actually learns (loss strictly
  * decreases), the trained model separates the classes it was distilled
  * from, and the sparse production form tracks the dense one.
  */
class QualityClassifierSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"${sfDir()}/documents.parquet")
      .filter(col("text").isNotNull)

  private lazy val label =
    TextAnalysis.qualityScore(col("text")) >= 0.65

  test("dense training: loss strictly decreases over 3 GD steps") {
    val rows = QualityClassifier.trainDense(docs, "text", label,
      nBuckets = 16, iters = 3, lr = 0.5, portable = true)
      .orderBy("iter").collect()
    assert(rows.length == 4)
    val losses = rows.map(_.getAs[Long]("loss_q"))
    assert(losses.sliding(2).forall { case Array(a, b) => b < a },
      s"loss trace not decreasing: ${losses.mkString(",")}")
    // iteration 0 is the zero model: p = 0.5 everywhere, so the
    // quantized squared loss is exactly n * 250000
    val n = docs
      .filter(size(TextAnalysis.tokens(lower(col("text")))) >= 1).count()
    assert(losses(0) == n * 250000L)
  }

  private def meanPGap(lbl: org.apache.spark.sql.Column, iters: Int,
      lr: Double): (Double, Double) = {
    val steps = QualityClassifier.fit(docs, "text", lbl,
      nBuckets = 16, iters = iters, lr = lr, portable = true)
    val last = steps.last
    val feat = QualityClassifier.featurize(docs, "text", lbl, 16,
      portable = true)
    val z = (0 until 16).foldLeft(lit(last.bias)) {
      case (acc, j) => acc + lit(last.weights(j)) * col(s"x$j")
    }
    val p = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
    val gap = feat.groupBy("y").agg(avg(p).as("mp"))
      .collect().map(r => r.getAs[Long]("y") -> r.getAs[Double]("mp"))
      .toMap
    (gap(1L), gap(0L))
  }

  test("trained model separates token-driven classes (mean p gap)") {
    // a label the hashed-unigram features can actually express: presence
    // of a specific token loads one bucket's relative frequency directly
    // relative-frequency features are ~1/16 scale and the token signal
    // lands in ONE of 16 buckets (Δx ≈ 0.04), so the attainable p-gap
    // after a bounded schedule is structurally small — assert it clears
    // a deterministic margin well above the zero-model (the fixture and
    // schedule are fixed, so the value is exact: ≈0.0070 here)
    val (p1, p0) = meanPGap(lower(col("text")).contains("spark"),
      iters = 40, lr = 4.0)
    assert(p1 > p0 + 0.005, s"no separation: p(y=1)=$p1 vs p(y=0)=$p0")
  }

  test("quality-label distillation moves in the right direction") {
    // char-class-ratio labels correlate only weakly with 16 hashed
    // unigram buckets — assert direction, not magnitude
    val (p1, p0) = meanPGap(label, iters = 3, lr = 0.5)
    assert(p1 > p0, s"wrong direction: p(y=1)=$p1 vs p(y=0)=$p0")
  }

  test("sparse production form: loss decreases at 4096 buckets") {
    val out = QualityClassifier.trainSparse(docs, "doc_id", "text", label,
      nBuckets = 4096, iters = 2, lr = 0.5)
      .orderBy("iter").collect()
    assert(out.length == 3)
    val losses = out.map(_.getAs[Long]("loss_q"))
    assert(losses.sliding(2).forall { case Array(a, b) => b < a },
      s"sparse loss trace not decreasing: ${losses.mkString(",")}")
    // weights exist after the first update
    assert(out(1).getAs[Long]("w_l1_q") > 0L)
  }

  test("xxhash64 and portable hashes train to comparable losses") {
    val lp = QualityClassifier.fit(docs, "text", label, 16, 2, 0.5,
      portable = true).last.lossQ
    val lx = QualityClassifier.fit(docs, "text", label, 16, 2, 0.5,
      portable = false).last.lossQ
    // different hash, same bucket statistics family: final losses land
    // in the same regime (hash choice must not change the math)
    assert(math.abs(lp - lx).toDouble / math.max(lp, lx) < 0.2,
      s"hash families diverged: portable=$lp xxhash=$lx")
  }
}
