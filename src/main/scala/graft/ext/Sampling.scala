package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling/splitting operators for training-data pipelines. */
object Sampling {

  /** Stable hash bucket in [0, 100) from a key column: md5 of the string
    * form, first 16 bits, mod 100. Engine-portable (md5 is md5 everywhere),
    * so the same row lands in the same split in any system — the property
    * a held-out set needs.
    */
  def hashBucket(key: Column, salt: String = ""): Column =
    (conv(substring(md5(concat(lit(salt), key.cast("string")).cast("binary")),
      1, 4), 16, 10).cast("int") % 100)

  /** Deterministic train/holdout split: adds a `split` column. Rows don't
    * move between splits when the dataset grows — membership depends only
    * on the key (+salt).
    */
  def deterministicSplit(
      df: DataFrame,
      keyCol: String,
      trainPct: Int = 80,
      salt: String = ""
  ): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), salt) < trainPct, "train")
        .otherwise("holdout"))

  /** Stratified sampling: per-stratum fractions via Spark's stratified
    * sampler (one pass, no shuffle). Strata not in `fractions` default to
    * `defaultFraction`.
    *
    * The distinct strata are collected to the driver to complete the
    * fraction map — correct for categorical strata, a footgun on a
    * high-cardinality key — so the collect is capped at `maxStrata`
    * (fetching maxStrata+1 keys, never the full set) and fails fast with
    * a clear error instead of silently materializing millions of keys.
    * For genuinely high-cardinality strata use `hashBucket` + a bucket
    * predicate instead (pure expressions, nothing on the driver).
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Long = 42L,
      maxStrata: Int = 10000
  ): DataFrame = {
    val keys = df.select(strataCol).distinct()
      .limit(maxStrata + 1).collect().map(_.get(0)).toSeq
    require(keys.length <= maxStrata,
      s"stratifiedSample: column '$strataCol' has more than $maxStrata " +
        "distinct strata; use Sampling.hashBucket for high-cardinality keys " +
        "or raise maxStrata explicitly")
    val full = keys.map(k =>
      k -> fractions.getOrElse(String.valueOf(k), defaultFraction)).toMap
    df.stat.sampleBy(strataCol, full, seed)
  }
}
