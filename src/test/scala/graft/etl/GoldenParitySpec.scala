package graft.etl

import graft.{Compare, SparkSpec}
import graft.io.Layers
import graft.schema.Schemas
import org.apache.spark.sql.functions._

/** SURVEY.md §5.2.1 — run the Spark clean/merge stages on the reference's
  * committed bronze CSVs and compare against the committed silver artifacts
  * (converted to µs timestamps by scripts/prepare_goldens.py; values
  * untouched).
  */
class GoldenParitySpec extends SparkSpec {

  private lazy val trafficClean =
    CleanTraffic(Layers.readCsv(spark, golden("traffic_raw.csv"), Schemas.trafficRaw))
  private lazy val weatherClean =
    CleanWeather(Layers.readCsv(spark, golden("weather_raw.csv"), Schemas.weatherRaw))

  test("traffic clean matches golden artifact (4,595 rows)") {
    val expected = spark.read.parquet(golden("traffic_clean.parquet"))
    Compare.assertSameData(trafficClean, expected, tol = 1e-9,
      sortCols = Seq("traffic_id", "date_time"))
  }

  test("weather clean matches golden artifact (4,625 rows)") {
    val expected = spark.read.parquet(golden("weather_clean.parquet"))
    Compare.assertSameData(weatherClean, expected, tol = 1e-9,
      sortCols = Seq("weather_id", "date_time"))
  }

  test("merge matches golden artifact (101,892 rows)") {
    val expected = spark.read.parquet(golden("merged_data.parquet"))
    val actual = MergeTrafficWeather(trafficClean, weatherClean)
    Compare.assertSameData(actual, expected, tol = 1e-9,
      sortCols = Seq("traffic_id", "weather_id"))
  }
}
