package graft.tools

import graft.GraftSession
import graft.analytics.{FactorAnalysisEM, Summary}
import graft.io.{LakePaths, Layers}

/** E3: the reference's interactive-notebook surface (Analysis.ipynb cells
  * 2-15) as a CLI — list layer contents, load gold artifacts, describe,
  * nunique, correlation matrix, top factor loadings, scenario summary.
  *
  * Usage: runMain graft.tools.Analyze <lakeRoot>
  */
object Analyze {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graftlake")
    val spark = GraftSession.quiet(GraftSession.local("graft-analyze"))
    val lake = LakePaths(root)

    println(s"== layers under $root ==")
    Seq("bronze", "silver", "gold").foreach { layer =>
      val entries = Layers.listParquet(spark, s"$root/$layer")
      println(s"$layer: ${entries.size} parquet objects")
    }

    val merged = Layers.readParquet(spark, lake.silver("merged_data.parquet"))
    println(s"\n== merged_data: ${merged.count()} rows, ${merged.columns.length} cols ==")
    println(s"plan-size estimate: ${Summary.estimatedSizeInBytes(merged)} bytes")

    println("\n== describe (exact) ==")
    Summary.describeNumeric(spark, merged).show(20, truncate = false)

    println("== nunique ==")
    Summary.nunique(merged.select("city", "area", "season", "weather_condition"))
      .show(truncate = false)

    println("== correlation matrix (pairwise, pandas semantics) ==")
    Summary.corrMatrix(spark, merged).show(20, truncate = false)

    println("== gold: scenarios ==")
    Layers.readParquet(spark, lake.gold("monte_carlo_scenarios.parquet"))
      .show(truncate = false)

    println("== gold: bootstrap CIs ==")
    Layers.readParquet(spark, lake.gold("monte_carlo_results.parquet"))
      .show(truncate = false)

    println("== gold: top |loading| variables per factor ==")
    val loadings = Layers.readParquet(spark, lake.gold("factor_loadings.parquet"))
    (1 to 5).foreach { f =>
      val top = FactorAnalysisEM.topLoadings(loadings, s"Factor_${f}_loading")
        .collect().map(r => s"${r.getString(0)}=${r.getDouble(1)}").mkString(", ")
      println(s"Factor_$f: $top")
    }
    spark.stop()
  }
}
