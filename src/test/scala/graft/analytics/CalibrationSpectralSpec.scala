package graft.analytics

import graft.SparkSpec
import graft.queries.Q
import org.apache.spark.sql.functions._

/** Structural properties of the round-5 calibration/spectral additions:
  * isotonic fit is monotone and weighted-mean-preserving on a known
  * violator pattern; the Brier decomposition identity holds; power
  * iteration recovers the dominant eigenpair of a known 2×2 system; the
  * anonymization ladder is monotone in k and marks the first feasible
  * level.
  */
class CalibrationSpectralSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic calibration pools adjacent violators, stays monotone") {
    // bins 0..3 with raw rates 0.2, 0.8, 0.4, 0.9 — bins 1,2 violate
    val df = (
      Seq.fill(8)((0.05, 0)) ++ Seq.fill(2)((0.05, 1)) ++ // bin0: 0.2
        Seq.fill(2)((0.15, 0)) ++ Seq.fill(8)((0.15, 1)) ++ // bin1: 0.8
        Seq.fill(6)((0.25, 0)) ++ Seq.fill(4)((0.25, 1)) ++ // bin2: 0.4
        Seq.fill(1)((0.35, 0)) ++ Seq.fill(9)((0.35, 1)) // bin3: 0.9
    ).toDF("score", "label")
    val fit = FeaturePrep
      .isotonicCalibration(df, col("score"), col("label") === 1)
      .collect()
    val iso = fit.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(iso(0L) == 0.2)
    // bins 1 and 2 pool to (8+4)/(10+10) = 0.6
    assert(iso(1L) == 0.6 && iso(2L) == 0.6)
    assert(iso(3L) == 0.9)
    assert(iso.toSeq.sortBy(_._1).map(_._2).sliding(2).forall {
      case Seq(a, b) => a <= b
      case _ => true
    })
  }

  test("brier decomposition identity: brier ≈ rel − res + unc") {
    val docs = Q.t(spark, sfDir("0.01"), "documents")
    val ntok = graft.ext.TextAnalysis.tokenCount(col("text"))
    val hits = graft.ext.TextAnalysis.langScore(col("text"), "en")
    val score = when(ntok === 0, lit(0.0))
      .otherwise(least(
        lit(5.0) * hits.cast("double") / ntok.cast("double"), lit(1.0)))
    val r = FeaturePrep
      .brierDecomposition(docs, score, coalesce(col("lang"), lit("")) === "en")
      .head()
    val (unc, rel, res, brier) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // identity holds up to the binned-vs-exact within-bin variance term,
    // which is bounded by the bin width (0.1) times base-rate variance
    assert(math.abs(brier - (rel - res + unc)) < 0.05,
      s"brier=$brier rel=$rel res=$res unc=$unc")
    assert(rel >= 0 && res >= 0 && unc >= 0 && brier >= 0)
  }

  test("dominantEigen recovers the dominant eigenpair of a 2-col system") {
    // y = x exactly → corr matrix [[1,1],[1,1]], eigenpair (2, [1,1]/√2)
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val r = Summary.dominantEigen(spark, df, Seq("x", "y"), decScale = 0)
      .collect()
    val lambda = r.head.getDouble(2)
    assert(math.abs(lambda - 2.0) < 1e-9, s"lambda=$lambda")
    r.foreach(row =>
      assert(math.abs(row.getDouble(1) - 1.0 / math.sqrt(2.0)) < 1e-9))
  }

  test("anonymization ladder marks the first level meeting k") {
    val out = graft.queries.CurationQueries.defs
      .find(_.name == "q221_anonymization_ladder").get
      .fn(spark, sfDir("0.01"))
      .collect()
    // min class size must be monotone nondecreasing up the ladder
    val mins = out.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(mins.sliding(2).forall { case Array(a, b) => b >= a })
    val chosen = out.filter(_.getBoolean(6))
    assert(chosen.length <= 1)
    chosen.foreach { c =>
      assert(c.getBoolean(5), "chosen level must meet k")
      assert(out.filter(_.getLong(0) < c.getLong(0))
        .forall(!_.getBoolean(5)), "no earlier level may meet k")
    }
  }

  test("lsh banding curve is monotone in s and steeper for more rows/band") {
    val curve = graft.ext.Dedup.lshBandingCurve(spark).collect()
    val byConfig = curve.groupBy(_.getLong(0))
    byConfig.foreach { case (_, rows) =>
      val ps = rows.sortBy(_.getDouble(2)).map(_.getDouble(3))
      assert(ps.sliding(2).forall { case Array(a, b) => b >= a })
    }
    // at s=0.9 every banding should be a near-certain candidate
    curve.filter(_.getDouble(2) == 0.9)
      .foreach(r => assert(r.getDouble(3) > 0.5))
  }
}
