package graft.analytics

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.Cleaning

import scala.util.Random

/** Gold stage: bootstrap confidence-interval estimation.
  * Mirrors python-service/scripts/monte_carlo.py:237-285: first `maxColumns`
  * numeric columns in schema order, median-filled, ≥21 non-null values,
  * `nSim` resamples of the column mean, then mean / population-std /
  * 2.5th–97.5th percentile (linear interpolation) of the resample means.
  *
  * Two execution strategies behind one result schema:
  *  - `driverSide` — exact multinomial resampling of a collected column.
  *    Honest and fast at reference scale (≤ ~1M rows per column).
  *  - `poisson` — distributed Poisson(1) bootstrap: every partition keeps a
  *    `nSim`-wide running (weightedSum, weight) pair per replicate and a
  *    single treeReduce combines them. One pass over the data for ALL
  *    columns and ALL replicates, no driver materialization — this is the
  *    100-TB path. Poisson(1) weights approximate multinomial resampling
  *    (classic scale-out bootstrap trick); statistically equivalent CIs.
  *
  * `apply` picks driver-side below `driverRowLimit` rows, Poisson above.
  * RNG differs from NumPy's by construction — parity is statistical
  * (CI-overlap tests, SURVEY.md §5.2), not bitwise.
  */
object Bootstrap {

  val resultSchema: StructType = StructType(
    Seq(
      StructField("index", StringType),
      StructField("mean_estimate", DoubleType),
      StructField("std_estimate", DoubleType),
      StructField("ci_lower_95", DoubleType),
      StructField("ci_upper_95", DoubleType),
      StructField("simulations", DoubleType)
    )
  )

  def apply(
      spark: SparkSession,
      df: DataFrame,
      nSim: Int = 5000,
      maxColumns: Int = 8,
      seed: Long = 42L,
      driverRowLimit: Long = 1000000L
  ): DataFrame = {
    val cols = Cleaning.numericCols(df)
    if (cols.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], resultSchema)
    val filled = medianFill(df.select(cols.map(col): _*), cols)
    val target = cols.take(maxColumns)
    val n = filled.count()
    if (n <= driverRowLimit) driverSide(spark, filled, target, nSim, seed)
    else poisson(spark, filled, target, nSim, seed)
  }

  /** Median-fill all numeric columns in one aggregate pass
    * (monte_carlo.py:265: fillna(median)).
    */
  def medianFill(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs = cols.map(c => percentile(col(c), lit(0.5)))
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      if (row.isNullAt(i)) d else d.na.fill(Map(c -> row.getDouble(i)))
    }
  }

  /** Exact multinomial bootstrap on collected columns (reference-scale path). */
  def driverSide(
      spark: SparkSession,
      filled: DataFrame,
      cols: Seq[String],
      nSim: Int,
      seed: Long
  ): DataFrame = {
    val rows = cols.zipWithIndex.flatMap { case (c, ci) =>
      val values = filled
        .select(col(c))
        .filter(col(c).isNotNull)
        .collect()
        .map(_.getDouble(0))
      if (values.length <= 20) None // monte_carlo.py:271
      else {
        val rng = new Random(seed + ci)
        val len = values.length
        val means = Array.tabulate(nSim) { _ =>
          var s = 0.0
          var i = 0
          while (i < len) { s += values(rng.nextInt(len)); i += 1 }
          s / len
        }
        Some(statsRow(c, means, nSim))
      }
    }
    toDF(spark, rows)
  }

  /** Distributed Poisson bootstrap: single pass, all columns × replicates. */
  def poisson(
      spark: SparkSession,
      filled: DataFrame,
      cols: Seq[String],
      nSim: Int,
      seed: Long
  ): DataFrame = {
    val k = cols.length
    val data = filled.select(cols.map(c => col(c).cast("double")): _*).rdd
    // acc(ci)(r) = weighted sum; wts(ci)(r) = total weight, per replicate r
    val (sums, wts) = data
      .mapPartitionsWithIndex { (pid, it) =>
        val rng = new Random(seed ^ (pid.toLong << 17))
        val acc = Array.fill(k, nSim)(0.0)
        val w = Array.fill(k, nSim)(0.0)
        it.foreach { row =>
          var r = 0
          while (r < nSim) {
            val weight = poissonDraw(rng).toDouble
            if (weight > 0) {
              var ci = 0
              while (ci < k) {
                if (!row.isNullAt(ci)) {
                  acc(ci)(r) += weight * row.getDouble(ci)
                  w(ci)(r) += weight
                }
                ci += 1
              }
            }
            r += 1
          }
        }
        Iterator.single((acc, w))
      }
      .treeReduce { (a, b) =>
        var ci = 0
        while (ci < k) {
          var r = 0
          while (r < nSim) {
            a._1(ci)(r) += b._1(ci)(r); a._2(ci)(r) += b._2(ci)(r); r += 1
          }
          ci += 1
        }
        a
      }
    val rows = cols.zipWithIndex.flatMap { case (c, ci) =>
      val means = Array.tabulate(nSim) { r =>
        if (wts(ci)(r) > 0) sums(ci)(r) / wts(ci)(r) else 0.0
      }
      if (wts(ci).forall(_ <= 20)) None else Some(statsRow(c, means, nSim))
    }
    toDF(spark, rows)
  }

  private def poissonDraw(rng: Random): Int = {
    // Knuth, λ=1: L = e^-1
    val L = 0.36787944117144233
    var k = 0; var p = 1.0
    while ({ p *= rng.nextDouble(); p > L }) k += 1
    k
  }

  private def statsRow(name: String, means: Array[Double], nSim: Int): Row = {
    val mean = means.sum / means.length
    val varPop =
      means.map(m => (m - mean) * (m - mean)).sum / means.length
    val sorted = means.sorted
    Row(
      name,
      round4(mean),
      round4(math.sqrt(varPop)),
      round4(percentileLinear(sorted, 2.5)),
      round4(percentileLinear(sorted, 97.5)),
      nSim.toDouble
    )
  }

  /** NumPy's default percentile: linear interpolation on sorted values. */
  def percentileLinear(sorted: Array[Double], p: Double): Double = {
    val idx = (sorted.length - 1) * p / 100.0
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (sorted(hi) - sorted(lo)) * (idx - lo)
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toDF(spark: SparkSession, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), resultSchema)
}
