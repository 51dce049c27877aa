package graft.schema

import org.apache.spark.sql.types._

/** Declared StructTypes for every table the engine touches.
  *
  * The reference infers all schemas (`pd.read_csv`, clean_traffic.py:60); we
  * declare them so mixed-type columns land deterministically instead of
  * depending on sampling. Numerics are DoubleType even for IDs — pandas
  * promotes int+NaN to float64 and the committed silver artifacts carry
  * `traffic_id: double` (see FIXTURES.md §A).
  */
object Schemas {

  /** bronze/traffic_raw.csv — generate_traffic_data.py:105-116 */
  val trafficRaw: StructType = StructType(
    Seq(
      StructField("traffic_id", DoubleType),
      StructField("date_time", StringType),
      StructField("city", StringType),
      StructField("area", StringType),
      StructField("vehicle_count", DoubleType),
      StructField("avg_speed_kmh", DoubleType),
      StructField("accident_count", DoubleType),
      StructField("congestion_level", StringType),
      StructField("road_condition", StringType),
      StructField("visibility_m", DoubleType)
    )
  )

  /** bronze/weather_raw.csv — generate_weather_data.py:148-160.
    * `visibility_m` is deliberately StringType: the raw column mixes ints with
    * garbage strings ("Unknown"/"NaN"/"xxx", generate_weather_data.py:133-142);
    * the clean stage coerces it (pd.to_numeric(errors='coerce') analog).
    */
  val weatherRaw: StructType = StructType(
    Seq(
      StructField("weather_id", DoubleType),
      StructField("date_time", StringType),
      StructField("city", StringType),
      StructField("season", StringType),
      StructField("temperature_c", DoubleType),
      StructField("humidity", DoubleType),
      StructField("rain_mm", DoubleType),
      StructField("wind_speed_kmh", DoubleType),
      StructField("visibility_m", StringType),
      StructField("weather_condition", StringType)
    )
  )

  /** events table (driver testdata) — streaming-shaped. */
  val events: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)
    )
  )

  /** documents table (driver testdata) — text-analysis extension surface. */
  val documents: StructType = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)
    )
  )

  /** embeddings table (driver testdata) — similarity-search extension. */
  val embeddings: StructType = StructType(
    Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)
    )
  )

  /** Multimodal lake table: media as opaque binary + typed metadata.
    * Decode/feature-extract stages are stubbed (no image/audio libs in this
    * environment) but the schema/partitioning/plumbing is real — see
    * graft.ext.Multimodal.
    */
  val media: StructType = StructType(
    Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType), // image | audio | video
      StructField("bytes", BinaryType),
      StructField(
        "meta",
        StructType(
          Seq(
            StructField("width", IntegerType),
            StructField("height", IntegerType),
            StructField("sample_rate", IntegerType),
            StructField("duration_ms", LongType),
            StructField("codec", StringType)
          )
        )
      )
    )
  )
}
