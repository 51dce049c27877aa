package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession
import graft.io.{LakePaths, Layers}
import graft.schema.Schemas

/** Silver stage: clean the bronze weather table.
  * Mirrors python-service/scripts/clean_weather.py:25-109. `visibility_m`
  * arrives as a string column (mixed ints + garbage,
  * generate_weather_data.py:133-142); the numeric pass coerces it to double
  * with nulls for garbage — the `pd.to_numeric(errors='coerce')` analog.
  */
object CleanWeather {

  val config: Cleaning.CleanConfig = Cleaning.CleanConfig(
    keyCol = "weather_id",
    timestampCol = "date_time",
    categoricalCols = Seq("city", "season", "weather_condition"),
    numericCols =
      Seq("temperature_c", "humidity", "rain_mm", "wind_speed_kmh", "visibility_m")
  )

  def apply(raw: DataFrame): DataFrame = Cleaning.clean(raw, config)

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("data")
    val spark = GraftSession.quiet(GraftSession.local("graft-clean-weather"))
    val lake = LakePaths(root)
    val raw = Layers.readCsv(spark, lake.bronze("weather_raw.csv"), Schemas.weatherRaw)
    Layers.writeParquet(apply(raw), lake.silver("weather_clean.parquet"))
    spark.stop()
  }
}
