package graft.analytics

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.Cleaning

/** Interactive analytics surface (notebook cells 8/13, SURVEY.md §3 E3):
  * describe, nunique, correlation matrix, top-k.
  */
object Summary {

  /** A11: pandas `describe()` analog — count/mean/std/min/quartiles/max per
    * numeric column, all in ONE aggregate pass (pandas scans per stat).
    * Output: one row per column: index, count, mean, std, min, p25, p50,
    * p75, max.
    *
    * `approximate = true` swaps exact quartiles for `approx_percentile`
    * sketches (bounded memory, no sort buffers) — the interactive-describe
    * path for lake-scale tables; keep the exact default where results feed
    * golden comparisons.
    */
  def describeNumeric(
      spark: SparkSession,
      df: DataFrame,
      approximate: Boolean = false
  ): DataFrame = {
    val cols = Cleaning.numericCols(df)
    if (cols.isEmpty)
      return spark.emptyDataFrame
    val exprs = cols.flatMap { c =>
      val dc = col(c).cast("double")
      val quartiles =
        if (approximate)
          approx_percentile(dc, array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
        else percentile(dc, array(lit(0.25), lit(0.5), lit(0.75)))
      Seq(
        count(dc),
        avg(dc),
        stddev_samp(dc),
        min(dc),
        quartiles, // one buffer/sketch for all three quartiles
        max(dc)
      )
    }
    val r = df.agg(exprs.head, exprs.tail: _*).head()
    val schema = StructType(
      StructField("index", StringType) +: Seq(
        "count", "mean", "std", "min", "p25", "p50", "p75", "max"
      ).map(StructField(_, DoubleType)))
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val base = i * 6
      val qs = if (r.isNullAt(base + 4)) Seq[Any](null, null, null)
        else r.getSeq[Double](base + 4)
      val flat = Seq[Any](
        r.getLong(base).toDouble,
        if (r.isNullAt(base + 1)) null else r.getDouble(base + 1),
        if (r.isNullAt(base + 2)) null else r.getDouble(base + 2),
        if (r.isNullAt(base + 3)) null else r.getDouble(base + 3),
        qs(0), qs(1), qs(2),
        if (r.isNullAt(base + 5)) null else r.getDouble(base + 5))
      Row.fromSeq(c +: flat)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** A11: `nunique()` per column — exact by default; at lake scale flip
    * `approximate=true` for one-pass HLL sketches.
    */
  def nunique(df: DataFrame, approximate: Boolean = false): DataFrame = {
    val exprs = df.columns.toSeq.map { c =>
      (if (approximate) approx_count_distinct(col(c))
       else countDistinct(col(c))).as(c)
    }
    df.agg(exprs.head, exprs.tail: _*)
  }

  /** A12: full Pearson correlation matrix over the numeric columns — the
    * pandas `.corr()` analog, with pandas' PAIRWISE null deletion: each
    * cell excludes only the rows where that specific pair has a null
    * (Spark's `corr(a,b)` aggregate does exactly that). All d·(d+1)/2
    * cells run in ONE aggregate pass. Output rows keyed by `index`.
    */
  def corrMatrix(spark: SparkSession, df: DataFrame): DataFrame = {
    val cols = Cleaning.numericCols(df)
    require(cols.nonEmpty, "no numeric columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if j >= i
    } yield (i, j)
    val exprs = pairs.map { case (i, j) =>
      corr(col(cols(i)).cast("double"), col(cols(j)).cast("double"))
    }
    val r = df.agg(exprs.head, exprs.tail: _*).head()
    val cell = pairs.zipWithIndex.map { case (p, k) =>
      p -> (if (r.isNullAt(k)) Double.NaN else r.getDouble(k))
    }.toMap
    def at(i: Int, j: Int): Double =
      if (j >= i) cell((i, j)) else cell((j, i))
    val schema = StructType(
      StructField("index", StringType) +:
        cols.map(c => StructField(c, DoubleType)))
    val rows = cols.zipWithIndex.map { case (c, i) =>
      Row.fromSeq(c +: cols.indices.map(j => at(i, j)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Listwise-deletion variant via Spark ML's one-pass vector correlation —
    * faster for very wide d, but drops any row with a null in ANY column
    * (not the pandas semantics).
    */
  def corrMatrixListwise(spark: SparkSession, df: DataFrame): DataFrame = {
    val cols = Cleaning.numericCols(df)
    require(cols.nonEmpty, "no numeric columns")
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray)
      .setOutputCol("_graft_features")
      .setHandleInvalid("skip")
      .transform(df.select(cols.map(col): _*))
    val m = Correlation
      .corr(assembled, "_graft_features")
      .head()
      .getAs[org.apache.spark.ml.linalg.Matrix](0)
    val schema = StructType(
      StructField("index", StringType) +:
        cols.map(c => StructField(c, DoubleType)))
    val rows = cols.zipWithIndex.map { case (c, i) =>
      Row.fromSeq(c +: cols.indices.map(j => m(i, j)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** A13 analog: the engine's size estimate for a plan's output (pandas
    * `memory_usage(deep=True)` has no distributed equivalent; Catalyst
    * statistics are the planning-time counterpart — report-only).
    */
  def estimatedSizeInBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** W1: top-k rows by absolute value of a column, deterministic tie-break. */
  def topKByAbs(df: DataFrame, c: String, k: Int, tieBreak: String): DataFrame =
    df.orderBy(abs(col(c)).desc, col(tieBreak).asc).limit(k)
}
