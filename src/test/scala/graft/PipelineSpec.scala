package graft

import graft.io.{LakePaths, Layers}
import org.apache.spark.sql.functions._

/** End-to-end orchestrator test: generate → bronze → silver → gold on a
  * scratch lake, assert every artifact exists with the expected shape.
  */
class PipelineSpec extends SparkSpec {

  test("full medallion pipeline produces all artifacts with expected shapes") {
    val root = java.nio.file.Files.createTempDirectory("pipelake").toString
    Pipeline.run(spark, LakePaths(root), generate = true, nRows = 1500)

    val traffic = Layers.readParquet(spark, s"$root/silver/traffic_clean.parquet")
    val weather = Layers.readParquet(spark, s"$root/silver/weather_clean.parquet")
    val merged = Layers.readParquet(spark, s"$root/silver/merged_data.parquet")
    assert(traffic.count() > 1000 && traffic.count() <= 1500)
    assert(weather.count() > 1000 && weather.count() <= 1500)
    assert(merged.count() >= traffic.count(), "left join must preserve traffic rows")
    assert(merged.columns.length == 19)

    // cleaned tables: no nulls anywhere in filled columns
    Seq("vehicle_count", "avg_speed_kmh", "city", "area").foreach { c =>
      assert(traffic.filter(col(c).isNull).count() == 0, s"$c has nulls")
    }

    val scenarios = Layers.readParquet(spark, s"$root/gold/monte_carlo_scenarios.parquet")
    assert(scenarios.count() == 4)
    assert(scenarios.columns.toSeq == Seq("scenario", "description",
      "mean_traffic", "traffic_std", "congestion_prob_high",
      "accident_risk_high", "threshold_used", "n_simulations"))

    val results = Layers.readParquet(spark, s"$root/gold/monte_carlo_results.parquet")
    assert(results.count() == 8) // first 8 numeric columns
    val loadings = Layers.readParquet(spark, s"$root/gold/factor_loadings.parquet")
    assert(loadings.count() >= 8 && loadings.columns.length == 6)

    val scored = Layers.readParquet(spark, s"$root/gold/traffic_weather_factors.parquet")
    assert(scored.count() == merged.count())
    assert((1 to 5).forall(i => scored.columns.contains(s"Factor_${i}_score")))
  }

  test("gold-stage fan-out guard (r8 VERDICT #8): goldStages=true past the " +
    "driver limit derates nSim to the budget instead of walking the trap; " +
    "Bootstrap itself throws loudly when handed an over-budget shape") {
    val root = java.nio.file.Files.createTempDirectory("pipelake_gold").toString
    // 15k traffic rows fan out ~20× in the merge → ~300k merged rows —
    // PAST driverRowLimit (200k), i.e. the distributed path the r8 trap
    // hit. A 10⁹-slot-update budget forces the derate to fire visibly.
    val budget = 1000000000L
    Pipeline.run(spark, LakePaths(root), generate = true, nRows = 15000,
      goldStages = true, bootstrapDrawBudget = budget)

    val merged = Layers.readParquet(spark, s"$root/silver/merged_data.parquet")
    val mergedRows = merged.count()
    assert(mergedRows > 200000L, s"need the distributed path: $mergedRows")
    val results = Layers.readParquet(spark,
      s"$root/gold/monte_carlo_results.parquet")
    assert(results.count() == 8)
    val kCols = math.min(8, etl.Cleaning.numericCols(merged).length)
    val expected = math.min(5000,
      analytics.Bootstrap.maxSimForBudget(mergedRows, kCols, budget))
    assert(expected < 5000, "fixture must actually derate")
    val sims = results.select("simulations").distinct().collect()
      .map(_.getDouble(0)).toSeq
    assert(sims == Seq(expected.toDouble),
      s"simulations column must carry the derated nSim: $sims vs $expected")

    // the engine-level guard: an over-budget call fails NAMING the knobs
    // rather than silently starting an hours-long replicate loop
    val e = intercept[IllegalArgumentException] {
      analytics.Bootstrap(spark, merged, nSim = 5000,
        driverRowLimit = 1000L, drawBudget = budget)
    }
    assert(e.getMessage.contains("drawBudget") &&
      e.getMessage.contains("nSim"), e.getMessage)
  }

  test("partitioned-by-day silver (--partitioned): day predicates prune " +
    "files at the source") {
    val root = java.nio.file.Files.createTempDirectory("pipelake_part").toString
    Pipeline.run(spark, LakePaths(root), generate = true, nRows = 1500,
      partitionedByDay = true)

    val path = s"$root/silver/traffic_clean.parquet"
    val dayDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_p_date=")).map(_.getName).sorted
    assert(dayDirs.length >= 2, s"expected multiple day partitions: ${dayDirs.toSeq}")

    def numFilesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val all = spark.read.parquet(path)
    val day = dayDirs.head.stripPrefix("_p_date=")
    val filtered = spark.read.parquet(path).filter(col("_p_date") === day)
    val (nAll, nDay) = (numFilesRead(all), numFilesRead(filtered))
    assert(nDay < nAll, s"day filter must prune files: read $nDay of $nAll")
    assert(nDay >= 1)
    // and the partition filter is a SOURCE-side prune, not a post-scan one
    val p = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains(day),
      s"expected a partition filter on $day:\n$p")

    // downstream artifacts still produced (merge ran on the pruned layout)
    val merged = Layers.readParquet(spark, s"$root/silver/merged_data.parquet")
    assert(merged.columns.length == 19)
    assert(!merged.columns.contains("_p_date"), "layout column must not leak")
  }

  test("bucketed silver layout: merge join runs with ZERO shuffle exchanges") {
    val root = java.nio.file.Files.createTempDirectory("pipelake_bkt").toString
    val b = Pipeline.BucketedSilver(tablePrefix = "graft_test_silver", nBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join: a broadcast would hide whether bucketing
    // removed the shuffle (at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Pipeline.run(spark, LakePaths(root), generate = true, nRows = 1500,
        bucketed = Some(b))

      val t = spark.table(s"${b.tablePrefix}_traffic_clean")
      val w = spark.table(s"${b.tablePrefix}_weather_clean")
      val mergePlan = etl.MergeTrafficWeather(t, w)
      mergePlan.collect() // AQE: final plan only fixed after execution
      val p = mergePlan.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("Exchange"),
        s"bucketed merge should be exchange-free:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"scan should be bucket-aware:\n$p")

      // and the bucketed path writes the same silver the plain path does
      val merged = Layers.readParquet(spark, s"$root/silver/merged_data.parquet")
      assert(merged.columns.length == 19)
      assert(merged.count() >= t.count(), "left join must preserve traffic rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("traffic", "weather").foreach(n =>
        spark.sql(s"DROP TABLE IF EXISTS ${b.tablePrefix}_${n}_clean"))
    }
  }

  test("bucketed silver at sf0.1 scale (100k rows, r7 VERDICT #10): the " +
    "exchange-free merge holds beyond unit scale, end-to-end through run()") {
    val root = java.nio.file.Files.createTempDirectory("pipelake_sf01").toString
    val b = Pipeline.BucketedSilver(tablePrefix = "graft_sf01_silver",
      nBuckets = 32)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // a previously killed run can leave table FILES behind with no
    // metastore entry — saveAsTable then fails locationAlreadyExists;
    // clear both layers up front
    Seq("traffic", "weather").foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS ${b.tablePrefix}_${n}_clean")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        s"${b.tablePrefix}_${n}_clean")
      if (loc.isDirectory) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    try {
      // silver-only: the merge fans traffic out ~20× (~2M merged rows at
      // 100k traffic), and the gold analytics at MERGED scale are golden-
      // verified elsewhere (AnalyticsGoldenSpec, 101,892-row parity) — this
      // test pins the LAYOUT claim: the bucketed merge stays exchange-free
      // beyond unit scale, end-to-end through run()
      Pipeline.run(spark, LakePaths(root), generate = true, nRows = 100000,
        bucketed = Some(b), goldStages = false)

      val t = spark.table(s"${b.tablePrefix}_traffic_clean")
      val w = spark.table(s"${b.tablePrefix}_weather_clean")
      assert(t.count() > 80000, "sf0.1-scale table")
      val mergePlan = etl.MergeTrafficWeather(t, w)
      mergePlan.write.format("noop").mode("overwrite").save()
      val p = mergePlan.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!p.contains("Exchange"),
        s"bucketed merge must stay exchange-free at sf0.1 scale:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"scan should be bucket-aware:\n$p")

      // the silver merge artifact exists at merged scale
      val merged = Layers.readParquet(spark,
        s"$root/silver/merged_data.parquet")
      assert(merged.count() >= t.count(),
        "left join must preserve traffic rows")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("traffic", "weather").foreach(n =>
        spark.sql(s"DROP TABLE IF EXISTS ${b.tablePrefix}_${n}_clean"))
    }
  }
}
