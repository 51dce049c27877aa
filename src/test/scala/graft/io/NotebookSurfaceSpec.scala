package graft.io

import graft.{Pipeline, SparkSpec}
import org.apache.spark.sql.functions._

/** The notebook-interactive surface (`Analysis.ipynb` cells 3–11) as
  * `spark.sql` over registered lake views: catalog discovery, describe,
  * value-counts/top-k, correlation — each SQL result pinned equal to the
  * DataFrame-API computation on the same artifact.
  */
class NotebookSurfaceSpec extends SparkSpec {

  private lazy val lake = {
    val root = java.nio.file.Files.createTempDirectory("nbsurface").toString
    Pipeline.run(spark, LakePaths(root), generate = true, nRows = 1200)
    LakePaths(root)
  }

  private lazy val views = NotebookSurface.registerViews(spark, lake)

  test("registration covers every silver/gold artifact and is catalog-" +
    "discoverable (SHOW TABLES — the notebook's bucket listing)") {
    assert(views.contains("silver_merged_data"))
    assert(views.contains("gold_factor_loadings"))
    assert(views.contains("gold_monte_carlo_scenarios"))
    val listed = spark.sql("SHOW TABLES").collect()
      .map(_.getAs[String]("tableName")).toSet
    views.foreach(v => assert(listed.contains(v), s"view $v not in catalog"))
  }

  test("describe via SQL == DataFrame aggregation (notebook cell 8)") {
    val sqlRow = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT city) AS n_cities,
        |  avg(vehicle_count) AS mean_vc, min(avg_speed_kmh) AS min_speed,
        |  max(avg_speed_kmh) AS max_speed
        |FROM silver_merged_data""".stripMargin).head()
    val apiRow = spark.read
      .parquet(lake.silver("merged_data.parquet"))
      .agg(count(lit(1)).as("n"), countDistinct(col("city")).as("n_cities"),
        avg(col("vehicle_count")).as("mean_vc"),
        min(col("avg_speed_kmh")).as("min_speed"),
        max(col("avg_speed_kmh")).as("max_speed"))
      .head()
    assert(sqlRow == apiRow)
  }

  test("top-k value counts via SQL == DataFrame (notebook cells 10-11)") {
    val sqlRows = spark.sql(
      """SELECT city, count(*) AS n FROM silver_traffic_clean
        |GROUP BY city ORDER BY n DESC, city LIMIT 5""".stripMargin)
      .collect().toSeq
    val apiRows = spark.read
      .parquet(lake.silver("traffic_clean.parquet"))
      .groupBy("city").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("city")).limit(5)
      .collect().toSeq
    assert(sqlRows == apiRows)
  }

  test("correlation readout via SQL == DataFrame corr (notebook cell 13's " +
    "heatmap data)") {
    val s = spark.sql(
      """SELECT corr(vehicle_count, avg_speed_kmh) AS c
        |FROM silver_merged_data""".stripMargin).head().getDouble(0)
    val a = spark.read.parquet(lake.silver("merged_data.parquet"))
      .agg(corr(col("vehicle_count"), col("avg_speed_kmh")).as("c"))
      .head().getDouble(0)
    assert(s == a)
    assert(math.abs(s) <= 1.0)
  }

  test("a filtered SQL read through the view still prunes and pushes down " +
    "(views are descriptors, not materializations)") {
    val q = spark.sql(
      """SELECT city, vehicle_count FROM silver_merged_data
        |WHERE vehicle_count > 100""".stripMargin)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("IsNotNull(vehicle_count)"), scan)
    assert(q.count() ==
      spark.read.parquet(lake.silver("merged_data.parquet"))
        .filter(col("vehicle_count") > 100).count())
  }
}
