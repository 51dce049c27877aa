package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the extension operators composed the
  * way a pretraining data pipeline uses them, as one lazy Spark plan chain:
  *
  *   quality score → language ID → quality/length filter → exact dedup
  *   → MinHash near-dedup → per-document token accounting
  *
  * Each stage is also usable standalone (TextAnalysis / Dedup). The stage
  * order is the cost order: cheap scan-side scoring first (pure expressions,
  * fused into the read), the shuffling dedups last against the already
  * reduced row set. Returns the curated corpus plus a one-row stats frame.
  */
object TrainingDataPipeline {

  final case class Config(
      minQuality: Double = 0.3,
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      keepLangs: Option[Seq[String]] = None,
      nearDupThreshold: Double = 0.7
  )

  final case class Result(curated: DataFrame, stats: DataFrame)

  def apply(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: Config = Config()
  ): Result = {
    val spark = docs.sparkSession
    val n0 = docs.count()

    // scan-side scoring: all pure column expressions, no shuffle
    val scored = docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("quality_score", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("pred_lang", TextAnalysis.langId(col(textCol)))

    val filtered = scored
      .filter(col("quality_score") >= config.minQuality)
      .filter(col("n_tokens").between(config.minTokens, config.maxTokens))
    val langFiltered = (config.keepLangs match {
      case Some(ls) => filtered.filter(col("pred_lang").isin(ls: _*))
      case None => filtered
    }).cache() // regex scoring feeds every later stage; evaluate it once
    val nFiltered = langFiltered.count()

    val exactDeduped = Dedup.exact(langFiltered, idCol, Seq(textCol))
    val nExact = exactDeduped.count()

    val curated = Dedup
      .minHashDedup(exactDeduped, idCol, textCol, config.nearDupThreshold)
      .cache() // serves the two stat actions below; released after
    val nFinal = curated.count()
    val tokenStats = curated.agg(
      sum(col("n_tokens")).cast("long").as("total_tokens"),
      round(avg(col("n_tokens")), 2).as("mean_tokens")).head()
    curated.unpersist(false)
    langFiltered.unpersist(false)

    import spark.implicits._
    val stats = Seq((n0, nFiltered, nExact, nFinal,
      tokenStats.getLong(0), tokenStats.getDouble(1)))
      .toDF("n_input", "n_after_filters", "n_after_exact_dedup",
        "n_curated", "total_tokens", "mean_tokens")
    Result(curated, stats)
  }
}
