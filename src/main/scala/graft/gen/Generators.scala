package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S10: seeded messy bronze-table generators, expressed as distributed
  * `spark.range` + `rand(seed)`/`when` expression pipelines — the Spark-first
  * form of generate_traffic_data.py:26-118 / generate_weather_data.py:46-162.
  * Distributions (value ranges, null/outlier/garbage rates, the three
  * timestamp formats) match the reference; exact NumPy bit-streams are not
  * reproducible by design (different RNG), so parity tests assert the mess
  * PROFILE, and golden-parity tests use the committed reference CSVs instead.
  */
object Generators {

  private def pick(c: org.apache.spark.sql.Column, opts: Seq[String]) =
    opts.zipWithIndex.foldLeft(lit(opts.head)) { case (acc, (o, i)) =>
      when(c === i, lit(o)).otherwise(acc)
    }

  /** Messy bronze traffic table (generate_traffic_data.py:26-118). */
  def traffic(spark: SparkSession, n: Long = 5000, seed: Long = 42): DataFrame = {
    val base = spark
      .range(n)
      .withColumn("traffic_id", (col("id") + 9001).cast("double"))
      // ~15 duplicate ids + ~8 null ids
      .withColumn("traffic_id",
        when(rand(seed + 1) < 15.0 / n, col("traffic_id") - 1)
          .otherwise(col("traffic_id")))
      .withColumn("traffic_id",
        when(rand(seed + 2) < 8.0 / n, lit(null)).otherwise(col("traffic_id")))
      // base timestamp: hourly steps through 2024, three formats + 7% garbage
      .withColumn("ts0",
        timestamp_seconds(lit(1704067200L) + (col("id") % 8760) * 3600))
      .withColumn("fmt", (rand(seed + 3) * 3).cast("int"))
      .withColumn("date_time",
        when(col("fmt") === 0, date_format(col("ts0"), "yyyy-MM-dd HH:mm"))
          .when(col("fmt") === 1, date_format(col("ts0"), "dd/MM/yyyy hha"))
          .otherwise(date_format(col("ts0"), "yyyy-MM-dd'T'HH:mm'Z'")))
      .withColumn("garbage", (rand(seed + 4) * 4).cast("int"))
      .withColumn("date_time",
        when(rand(seed + 5) < 0.07,
          pick(col("garbage"),
            Seq("TBD", "2099-00-00 99:99", "32/13/2025 25:61", "Invalid")))
          .otherwise(col("date_time")))
      .withColumn("city",
        when(rand(seed + 6) < 0.5, lit("London")).otherwise(lit(null)))
      .withColumn("area_i", (rand(seed + 7) * 6).cast("int"))
      .withColumn("area",
        when(col("area_i") === 5, lit(null))
          .otherwise(pick(col("area_i"),
            Seq("Camden", "Chelsea", "Islington", "Southwark", "Kensington"))))

    def numeric(c: String, s: Long, lo: Double, hi: Double,
        outlierRate: Double, outLo: Double, outHi: Double) = (d: DataFrame) =>
      d.withColumn(c, (rand(seed + s) * (hi - lo) + lo))
        .withColumn(c,
          when(rand(seed + s + 100) < outlierRate,
            rand(seed + s + 200) * (outHi - outLo) + outLo)
            .otherwise(col(c)))
        .withColumn(c,
          when(rand(seed + s + 300) < 0.05, lit(null)).otherwise(round(col(c), 1)))

    val withNums = Seq(
      numeric("vehicle_count", 10, 0, 5000, 0.05, 10000, 25000),
      numeric("avg_speed_kmh", 20, 3, 120, 0.05, -20, -1),
      numeric("accident_count", 30, 0, 10, 0.02, 20, 60),
      numeric("visibility_m", 40, 50, 10000, 0.05, 20000, 50000)
    ).foldLeft(base)((d, f) => f(d))

    withNums
      .withColumn("congestion_level",
        when(rand(seed + 50) < 0.05, lit(null))
          .otherwise(pick((rand(seed + 51) * 3).cast("int"),
            Seq("Low", "Medium", "High"))))
      .withColumn("road_condition",
        when(rand(seed + 52) < 0.05, lit(null))
          .otherwise(pick((rand(seed + 53) * 4).cast("int"),
            Seq("Dry", "Wet", "Snowy", "Damaged"))))
      .select("traffic_id", "date_time", "city", "area", "vehicle_count",
        "avg_speed_kmh", "accident_count", "congestion_level",
        "road_condition", "visibility_m")
  }

  /** Messy bronze weather table (generate_weather_data.py:46-162);
    * `visibility_m` is mixed-type (ints + garbage strings).
    */
  def weather(spark: SparkSession, n: Long = 5000, seed: Long = 43): DataFrame = {
    val base = spark
      .range(n)
      .withColumn("weather_id", (col("id") + 5001).cast("double"))
      .withColumn("weather_id",
        when(rand(seed + 1) < 20.0 / n, col("weather_id") - 1)
          .otherwise(col("weather_id")))
      .withColumn("weather_id",
        when(rand(seed + 2) < 10.0 / n, lit(null)).otherwise(col("weather_id")))
      .withColumn("ts0",
        timestamp_seconds(lit(1704067200L) + (col("id") % 8760) * 3600))
      .withColumn("fmt", (rand(seed + 3) * 3).cast("int"))
      .withColumn("date_time",
        when(col("fmt") === 0, date_format(col("ts0"), "yyyy-MM-dd HH:mm"))
          .when(col("fmt") === 1, date_format(col("ts0"), "dd/MM/yyyy hha"))
          .otherwise(date_format(col("ts0"), "yyyy-MM-dd'T'HH:mm'Z'")))
      .withColumn("date_time",
        when(rand(seed + 5) < 0.07,
          pick((rand(seed + 4) * 4).cast("int"),
            Seq("Unknown", "2099-13-40 25:61", "32/15/2024 99:99",
              "2024-01-15T99:00Z")))
          .otherwise(col("date_time")))
      .withColumn("city",
        when(rand(seed + 6) < 0.5, lit("London")).otherwise(lit(null)))
      // season from month with messy fallback (generate_weather_data.py:26-44)
      .withColumn("season",
        when(month(col("ts0")).isin(12, 1, 2), "Winter")
          .when(month(col("ts0")).isin(3, 4, 5), "Spring")
          .when(month(col("ts0")).isin(6, 7, 8), "Summer")
          .otherwise("Autumn"))
      .withColumn("season",
        when(rand(seed + 7) < 0.05,
          pick((rand(seed + 8) * 3).cast("int"),
            Seq("Winter", "FoggySeason", "Winter")))
          .otherwise(col("season")))
      .withColumn("season",
        when(rand(seed + 9) < 0.02, lit(null)).otherwise(col("season")))

    def numeric(c: String, s: Long, lo: Double, hi: Double,
        outlierRate: Double, outLo: Double, outHi: Double) = (d: DataFrame) =>
      d.withColumn(c, (rand(seed + s) * (hi - lo) + lo))
        .withColumn(c,
          when(rand(seed + s + 100) < outlierRate,
            rand(seed + s + 200) * (outHi - outLo) + outLo)
            .otherwise(col(c)))
        .withColumn(c,
          when(rand(seed + s + 300) < 0.05, lit(null)).otherwise(round(col(c), 1)))

    val withNums = Seq(
      numeric("temperature_c", 10, -5, 35, 0.03, -30, 60),
      numeric("humidity", 20, 20, 100, 0.03, -10, 150),
      numeric("rain_mm", 30, 0, 50, 0.03, 120, 200),
      numeric("wind_speed_kmh", 40, 0, 80, 0.03, 200, 300)
    ).foldLeft(base)((d, f) => f(d))

    withNums
      // mixed-type visibility: int strings + garbage (3%) + nulls (5%)
      .withColumn("visibility_m",
        (rand(seed + 60) * 9950 + 50).cast("int").cast("string"))
      .withColumn("visibility_m",
        when(rand(seed + 61) < 0.03,
          pick((rand(seed + 62) * 4).cast("int"),
            Seq("50000", "Unknown", "NaN", "xxx")))
          .otherwise(col("visibility_m")))
      .withColumn("visibility_m",
        when(rand(seed + 63) < 0.05, lit(null)).otherwise(col("visibility_m")))
      .withColumn("weather_condition",
        when(rand(seed + 64) < 0.05, lit(null))
          .otherwise(pick((rand(seed + 65) * 5).cast("int"),
            Seq("Clear", "Rain", "Fog", "Storm", "Snow"))))
      .select("weather_id", "date_time", "city", "season", "temperature_c",
        "humidity", "rain_mm", "wind_speed_kmh", "visibility_m",
        "weather_condition")
  }
}
