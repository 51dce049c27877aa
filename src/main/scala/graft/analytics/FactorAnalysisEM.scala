package graft.analytics

import breeze.linalg.{diag, eigSym, inv, DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.Cleaning

/** Gold stage: Factor Analysis (latent linear-Gaussian factors).
  * Re-expresses sklearn.decomposition.FactorAnalysis as used by
  * python-service/scripts/factor_analysis.py:96-255.
  *
  * sklearn's fit iterates an SVD of the Ψ-scaled, centered data matrix. The
  * same update depends on the data ONLY through the d×d MLE covariance S:
  * the singular values/vectors of X·diag(1/(√ψ·√n)) are exactly the
  * eigenpairs of Ψ^{-1/2} S Ψ^{-1/2}. So we compute (n, μ, S) in ONE
  * distributed pass (treeAggregate of outer products — d ≤ tens, so the d×d
  * state is tiny) and run the EM/eigen iteration on the driver with Breeze.
  * Data never leaves the cluster; the driver handles an 11×11 matrix.
  *
  * Scores are the posterior means E[z|x] = (x−μ)ᵀ Ψ⁻¹W̃ᵀ(I + W̃Ψ⁻¹W̃ᵀ)⁻¹ —
  * computed per-row as plain Column linear combinations (codegen'd, no UDF),
  * which also sidesteps the reference's fragile positional concat
  * (factor_analysis.py:221-224, SURVEY.md §2.4 J2).
  */
object FactorAnalysisEM {

  final case class FAModel(
      cols: Seq[String],
      mean: DenseVector[Double],
      components: DenseMatrix[Double], // k×d, sklearn components_
      noiseVariance: DenseVector[Double], // Ψ, length d
      logLikelihood: Seq[Double],
      nIter: Int,
      medianFill: Seq[Double] // per-column impute value (median, like fit)
  ) {
    def k: Int = components.rows
    def d: Int = components.cols
  }

  private val Small = 1e-12 // sklearn SMALL

  /** Numeric subset → median-impute → drop near-constant (std ≤ 0.01,
    * sample std like pandas .std()): factor_analysis.py:178-185.
    * Also returns the per-kept-column median so `transform` imputes the
    * same way fit did (sklearn scores the median-filled matrix).
    */
  def prepare(df: DataFrame): (DataFrame, Seq[String], Seq[Double]) = {
    val numeric = Cleaning.numericCols(df)
    if (numeric.isEmpty) return (df.select(), Seq.empty, Seq.empty)
    val sub = df.select(numeric.map(col): _*)
    val medExprs = numeric.map(c => percentile(col(c).cast("double"), lit(0.5)))
    val medRow = sub.agg(medExprs.head, medExprs.tail: _*).head()
    val medians = numeric.indices.map(i =>
      if (medRow.isNullAt(i)) 0.0 else medRow.getDouble(i))
    val filled = numeric.zipWithIndex.foldLeft(sub) { case (d, (c, i)) =>
      if (medRow.isNullAt(i)) d else d.na.fill(Map(c -> medians(i)))
    }
    val stdExprs = numeric.map(c => stddev_samp(col(c)))
    val stds = filled.agg(stdExprs.head, stdExprs.tail: _*).head()
    val keptIdx = numeric.indices.filter(i =>
      !stds.isNullAt(i) && stds.getDouble(i) > 0.01)
    val kept = keptIdx.map(numeric)
    (filled.select(kept.map(col): _*), kept, keptIdx.map(medians))
  }

  /** Distributed sufficient statistics: n, mean, MLE covariance (÷n).
    *
    * One declarative aggregate pass: count + d column sums + d(d+1)/2
    * product sums, all inside whole-stage codegen over the columnar scan
    * with map-side partial aggregation. (The earlier formulation dropped to
    * an RDD mapPartitions/treeReduce — correct, but it forces
    * InternalRow→Row conversion and abandons codegen and vectorized
    * reading. Same values, same null→0.0 coercion.)
    */
  def momentStats(df: DataFrame, cols: Seq[String])
      : (Long, DenseVector[Double], DenseMatrix[Double]) = {
    val d = cols.length
    val x = cols.map(c => coalesce(col(c).cast("double"), lit(0.0)))
    val sumExprs = (0 until d).map(i => sum(x(i)))
    val prodExprs = for { i <- 0 until d; j <- 0 to i } yield sum(x(i) * x(j))
    val aggs = count(lit(1)) +: (sumExprs ++ prodExprs)
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    require(n > 0, "momentStats on empty input")
    def at(k: Int): Double = if (row.isNullAt(k)) 0.0 else row.getDouble(k)
    val mean = DenseVector(Array.tabulate(d)(i => at(1 + i) / n))
    val cov = DenseMatrix.zeros[Double](d, d)
    var idx = 1 + d
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val v = at(idx) / n - mean(i) * mean(j)
        cov(i, j) = v; cov(j, i) = v
        idx += 1
        j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Covariance-based EM, faithful to sklearn's update & stopping rule
    * (tol on log-likelihood delta, Ψ floor at 1e-12, ll constant
    * d·log(2π)+k).
    */
  def fit(
      df: DataFrame,
      nComponents: Int,
      tol: Double = 1e-2,
      maxIter: Int = 1000
  ): FAModel = {
    val (prepared, cols, medians) = prepare(df)
    require(cols.nonEmpty, "no usable numeric columns for factor analysis")
    val k = math.min(nComponents, cols.length - 1).max(1)
    val (n, mean, cov) = momentStats(prepared, cols)
    val d = cols.length
    val varDiag = diag(cov).copy // np.var(X, axis=0), ddof=0
    val llconst = d * math.log(2 * math.Pi) + k

    var psi = DenseVector.ones[Double](d)
    var w = DenseMatrix.zeros[Double](k, d)
    var oldLl = Double.NegativeInfinity
    val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val sqrtPsi = psi.map(math.sqrt(_) + Small)
      // M = Ψ^{-1/2} S Ψ^{-1/2}; eigenpairs of M == squared singular values
      // of the scaled data matrix sklearn decomposes each iteration.
      val m = DenseMatrix.tabulate(d, d)((i, j) =>
        cov(i, j) / (sqrtPsi(i) * sqrtPsi(j)))
      val es = eigSym(m)
      // top-k eigenvalues descending
      val order = (0 until d).sortBy(i => -es.eigenvalues(i))
      val topIdx = order.take(k)
      val s = topIdx.map(es.eigenvalues(_)).toArray
      val unexpVar = order.drop(k).map(es.eigenvalues(_)).sum
      // W = sqrt(max(s-1,0)) * Vt * sqrt_psi  (k×d)
      w = DenseMatrix.tabulate(k, d) { (i, j) =>
        math.sqrt(math.max(s(i) - 1.0, 0.0)) *
          es.eigenvectors(j, topIdx(i)) * sqrtPsi(j)
      }
      var ll = llconst + s.map(math.log).sum + unexpVar +
        psi.toArray.map(math.log).sum
      ll *= -n / 2.0
      lls += ll
      if (ll - oldLl < tol && iter > 0) converged = true
      else {
        oldLl = ll
        // Ψ = max(var - colSums(W∘W), SMALL)
        val wsq = DenseVector.tabulate(d)(j =>
          (0 until k).map(i => w(i, j) * w(i, j)).sum)
        psi = DenseVector.tabulate(d)(j =>
          math.max(varDiag(j) - wsq(j), Small))
      }
      iter += 1
    }
    FAModel(cols, mean, w, psi, lls.toSeq, iter, medians)
  }

  /** Per-variable loadings table: `index` + Factor_i_loading, rounded 4
    * (factor_analysis.py:205-209).
    */
  def loadingsDF(spark: SparkSession, model: FAModel): DataFrame = {
    val schema = StructType(
      StructField("index", StringType) +:
        (1 to model.k).map(i =>
          StructField(s"Factor_${i}_loading", DoubleType)))
    val rows = model.cols.zipWithIndex.map { case (c, j) =>
      Row.fromSeq(
        c +: (0 until model.k).map(i =>
          BigDecimal(model.components(i, j))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Score projection matrix P (d×k): scores = (x−μ)ᵀ P, the sklearn
    * `transform` posterior mean.
    */
  def projection(model: FAModel): DenseMatrix[Double] = {
    val wpsi = DenseMatrix.tabulate(model.k, model.d)((i, j) =>
      model.components(i, j) / model.noiseVariance(j)) // k×d
    val covZ = inv(
      DenseMatrix.eye[Double](model.k) + wpsi * model.components.t) // k×k
    wpsi.t * covZ // d×k
  }

  /** Append Factor_i_score columns — per-row linear combinations, pure
    * Column arithmetic (whole-stage codegen), no positional concat. Nulls
    * are median-imputed exactly as during fit (sklearn scores the
    * median-filled matrix).
    */
  def transform(df: DataFrame, model: FAModel): DataFrame = {
    val p = projection(model)
    (1 to model.k).foldLeft(df) { (d, i) =>
      val expr = model.cols.zipWithIndex
        .map { case (c, j) =>
          (coalesce(col(c).cast("double"), lit(model.medianFill(j))) -
            lit(model.mean(j))) * lit(p(j, i - 1))
        }
        .reduce(_ + _)
      d.withColumn(s"Factor_${i}_score", expr)
    }
  }

  /** Full gold stage: fit on merged data, return (scored table, loadings). */
  def apply(
      spark: SparkSession,
      merged: DataFrame,
      nComponents: Int = 5
  ): (DataFrame, DataFrame) = {
    val model = fit(merged, nComponents)
    (transform(merged, model), loadingsDF(spark, model))
  }

  /** W1: top-k variables by |loading| for a factor (factor_analysis.py:214-216). */
  def topLoadings(loadings: DataFrame, factorCol: String, k: Int = 2): DataFrame =
    loadings
      .select(col("index"), col(factorCol))
      .orderBy(abs(col(factorCol)).desc, col("index").asc)
      .limit(k)
}
