package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession
import graft.io.{LakePaths, Layers}
import graft.schema.Schemas

/** Silver stage: clean the bronze traffic table.
  * Mirrors python-service/scripts/clean_traffic.py:41-148 (see SURVEY.md §3 E2
  * for the operator-order trace that the golden parity test pins down).
  */
object CleanTraffic {

  val config: Cleaning.CleanConfig = Cleaning.CleanConfig(
    keyCol = "traffic_id",
    timestampCol = "date_time",
    categoricalCols = Seq("city", "area", "congestion_level", "road_condition"),
    numericCols =
      Seq("vehicle_count", "avg_speed_kmh", "accident_count", "visibility_m")
  )

  def apply(raw: DataFrame): DataFrame = Cleaning.clean(raw, config)

  /** spark-submit-able single-stage entry, mirroring the reference's
    * script-per-stage surface: args = lake root.
    */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("data")
    val spark = GraftSession.quiet(GraftSession.local("graft-clean-traffic"))
    val lake = LakePaths(root)
    val raw = Layers.readCsv(spark, lake.bronze("traffic_raw.csv"), Schemas.trafficRaw)
    Layers.writeParquet(apply(raw), lake.silver("traffic_clean.parquet"))
    spark.stop()
  }
}
