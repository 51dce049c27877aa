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

  /** ENGINE-PORTABLE fixed-iteration factor analysis — q42's registered
    * form since r6 (VERDICT r5 #1): Rubin–Thayer covariance-space EM with
    * k = 2 factors and `iters` FIXED iterations from a fixed init, run on
    * the CORRELATION matrix of integer-quantized values, so every number
    * in the fold is a deterministic IEEE sequence a DuckDB oracle replays
    * expression-for-expression:
    *
    *  - values quantize to floor(v·100 + 0.5) CENTI-UNIT longs and are
    *    CENTERED by the integer mean (pass 1: sums → shift = s div n;
    *    pass 2: centered moments) so every product sum FITS int64 through
    *    the sf0.1 bench tier (Σz² ≈ n·var: ~6e18 at 600k rows) — int64 →
    *    double casts are correctly rounded in BOTH engines,
    *    where an int128-backed wide decimal → double cast is not
    *    guaranteed to be; overflow past the envelope errors LOUDLY
    *    (longValueExact / CAST AS BIGINT), never silently diverges;
    *  - covariance/correlation/EM updates are fixed-shape +,−,×,÷,sqrt
    *    chains (closed-form 2×2 inverses — NO eigendecomposition, which
    *    is why sklearn's eigen-EM [[fit]] itself cannot be oracled);
    *  - ψ floors via max(·, 1e-12), left-associated 4-term sums, raw
    *    (unrounded) double outputs — negative loadings round differently
    *    across engines, raw doubles are bit-identical when shapes match.
    *
    * The sklearn-faithful [[fit]] stays the production form (x42 channel,
    * golden-pinned loadings); q71 pins the DECIMAL-routed moments. Scale
    * shape: ONE codegen aggregate pass (count + 4 sums + 10 product sums)
    * — the only part that touches data — then driver math on a 4×4.
    */
  def fitPortableLoadings(
      spark: SparkSession,
      df: DataFrame,
      iters: Int = 5
  ): DataFrame = {
    val cols = Cleaning.numericCols(df)
    require(cols.length == 4, "portable EM fold is generated for d=4, k=2")
    val d = 4
    val dec = DecimalType(18, 0)
    val q = cols.map(c =>
      floor(coalesce(col(c).cast("double"), lit(0.0)) * lit(100) + lit(0.5))
        .cast("long"))
    // pass 1: count + raw centi sums → integer shifts (positive operands:
    // JVM / and DuckDB // agree — truncation)
    val aggs1 = count(lit(1)) +: (0 until d).map(i => sum(q(i)))
    val row1 = df.agg(aggs1.head, aggs1.tail: _*).head()
    val n = row1.getLong(0)
    require(n > 0, "portable EM on empty input")
    val nD = n.toDouble
    val shift = Array.tabulate(d)(i => row1.getLong(1 + i) / n)
    // pass 2: centered moments — every sum fits int64 (longValueExact
    // errors loudly past the envelope, mirroring the oracle's BIGINT cast)
    val z = (0 until d).map(i => q(i) - lit(shift(i)))
    val aggs2 = (0 until d).map(i => sum(z(i))) ++
      (for { i <- 0 until d; j <- 0 to i }
        yield sum(z(i).cast(dec) * z(j).cast(dec)))
    val row = df.agg(aggs2.head, aggs2.tail: _*).head()
    val sD = Array.tabulate(d)(i => row.getLong(i).toDouble)
    val pD = Array.ofDim[Double](d, d)
    var idx = d
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        val v = row.getDecimal(idx).longValueExact.toDouble
        pD(i)(j) = v; pD(j)(i) = v
        idx += 1; j += 1
      }
      i += 1
    }
    // fixed shapes mirrored 1:1 in the oracle SQL (StatQueries): change
    // an association order here and the q42 hash breaks
    val cov = Array.tabulate(d, d)((a, b) =>
      pD(a)(b) / nD - (sD(a) / nD) * (sD(b) / nD))
    val r = Array.tabulate(d, d)((a, b) =>
      cov(a)(b) / (math.sqrt(cov(a)(a)) * math.sqrt(cov(b)(b))))
    var w = Array(Array(1.0, 0.5, 0.5, 0.5), Array(0.5, 1.0, 0.5, 0.5))
    var p = Array(1.0, 1.0, 1.0, 1.0)
    def s4(f: Int => Double): Double = f(0) + f(1) + f(2) + f(3)
    var it = 0
    while (it < iters) {
      val m11 = 1.0 + (s4(j => w(0)(j) * w(0)(j) / p(j)))
      val m12 = s4(j => w(0)(j) * w(1)(j) / p(j))
      val m22 = 1.0 + (s4(j => w(1)(j) * w(1)(j) / p(j)))
      val det = m11 * m22 - m12 * m12
      val g11 = m22 / det
      val g12 = (0.0 - m12) / det
      val g22 = m11 / det
      val b = Array.tabulate(2, d)((fi, j) =>
        ((if (fi == 0) g11 else g12) * w(0)(j) +
          (if (fi == 0) g12 else g22) * w(1)(j)) / p(j))
      val bs = Array.tabulate(2, d)((fi, j) => s4(l => b(fi)(l) * r(l)(j)))
      val e11 = g11 + (s4(j => bs(0)(j) * b(0)(j)))
      val e12 = g12 + (s4(j => bs(0)(j) * b(1)(j)))
      val e22 = g22 + (s4(j => bs(1)(j) * b(1)(j)))
      val dete = e11 * e22 - e12 * e12
      val h11 = e22 / dete
      val h12 = (0.0 - e12) / dete
      val h22 = e11 / dete
      val wn = Array.tabulate(2, d)((fi, j) =>
        (if (fi == 0) h11 else h12) * bs(0)(j) +
          (if (fi == 0) h12 else h22) * bs(1)(j))
      val pn = Array.tabulate(d)(j =>
        math.max(r(j)(j) - (bs(0)(j) * wn(0)(j) + bs(1)(j) * wn(1)(j)), 1e-12))
      w = wn
      p = pn
      it += 1
    }
    import spark.implicits._
    cols.zipWithIndex.map { case (c, j) => (c, w(0)(j), w(1)(j), p(j)) }
      .toDF("index", "factor_1_loading", "factor_2_loading", "uniqueness")
      .orderBy("index")
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
