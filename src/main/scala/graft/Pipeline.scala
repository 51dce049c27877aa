package graft

import org.apache.spark.sql.SparkSession
import graft.analytics.{Bootstrap, FactorAnalysisEM, MonteCarlo}
import graft.etl.{CleanTraffic, CleanWeather, MergeTrafficWeather}
import graft.gen.Generators
import graft.io.{LakePaths, Layers}
import graft.schema.Schemas

/** E1: the full medallion pipeline (main.py:36-114), as one lazy Spark job
  * chain with parquet layer boundaries kept for restartability:
  *
  *   generate → bronze CSV → clean ×2 → silver parquet → merge → silver
  *   → factor analysis + monte carlo + bootstrap → gold parquet
  *
  * Each stage is a pure DataFrame→DataFrame function; this object only wires
  * paths. Layer roots are plain Hadoop FS URIs, so `root` may be
  * `file:/...`, `s3a://lake`, or `hdfs://nn/lake` unchanged.
  */
object Pipeline {

  /** Silver tables bucketed+sorted on the merge key `(city, date_only)` —
    * the 100-TB layout: the write-time shuffle is paid once per table and
    * the merge join (plus any downstream city/day aggregation) runs with
    * ZERO exchanges (PipelineSpec asserts it). `date_only` is materialized
    * into the tables so the join key matches the bucket spec exactly.
    */
  final case class BucketedSilver(
      tablePrefix: String = "graft_silver",
      nBuckets: Int = 32)

  def run(spark: SparkSession, lake: LakePaths,
      generate: Boolean = true, nRows: Long = 5000,
      bucketed: Option[BucketedSilver] = None): Unit = {
    if (generate) {
      Layers.writeCsv(Generators.traffic(spark, nRows), lake.bronze("traffic_raw.csv"), singleFile = true)
      Layers.writeCsv(Generators.weather(spark, nRows), lake.bronze("weather_raw.csv"), singleFile = true)
    }

    val trafficRaw = Layers.readCsv(spark, lake.bronze("traffic_raw.csv"), Schemas.trafficRaw)
    val weatherRaw = Layers.readCsv(spark, lake.bronze("weather_raw.csv"), Schemas.weatherRaw)

    val (traffic, weather) = bucketed match {
      case Some(b) =>
        import org.apache.spark.sql.functions.{col, to_date}
        def day(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("date_only", to_date(col("date_time")))
        Layers.writeBucketed(day(CleanTraffic(trafficRaw)),
          s"${b.tablePrefix}_traffic_clean", Seq("city", "date_only"), b.nBuckets)
        Layers.writeBucketed(day(CleanWeather(weatherRaw)),
          s"${b.tablePrefix}_weather_clean", Seq("city", "date_only"), b.nBuckets)
        (spark.table(s"${b.tablePrefix}_traffic_clean"),
          spark.table(s"${b.tablePrefix}_weather_clean"))
      case None =>
        Layers.writeParquet(CleanTraffic(trafficRaw), lake.silver("traffic_clean.parquet"))
        Layers.writeParquet(CleanWeather(weatherRaw), lake.silver("weather_clean.parquet"))
        (Layers.readParquet(spark, lake.silver("traffic_clean.parquet")),
          Layers.readParquet(spark, lake.silver("weather_clean.parquet")))
    }
    Layers.writeParquet(MergeTrafficWeather(traffic, weather), lake.silver("merged_data.parquet"))

    val merged = Layers.readParquet(spark, lake.silver("merged_data.parquet")).cache()

    val (scored, loadings) = FactorAnalysisEM(spark, merged)
    Layers.writeParquet(scored, lake.gold("traffic_weather_factors.parquet"))
    Layers.writeParquet(loadings, lake.gold("factor_loadings.parquet"))

    Layers.writeParquet(MonteCarlo.simulate(spark, merged), lake.gold("monte_carlo_scenarios.parquet"))
    Layers.writeParquet(Bootstrap(spark, merged), lake.gold("monte_carlo_results.parquet"))
    merged.unpersist()
    ()
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("data")
    val spark = GraftSession.quiet(GraftSession.local("graft-pipeline"))
    run(spark, LakePaths(root))
    spark.stop()
  }
}
