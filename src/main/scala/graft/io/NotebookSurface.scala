package graft.io

import org.apache.spark.sql.SparkSession

/** The interactive `spark.sql` surface over a medallion lake — the
  * engine-side analog of the reference's notebook workflow
  * (`Analysis.ipynb` cells 3–11: list the buckets' objects, read the
  * silver/gold parquet tables, then describe / value-count / top-k them
  * interactively).
  *
  * [[registerViews]] maps every parquet artifact under the lake's
  * silver/gold layers to a temp view named `<layer>_<basename>`, after
  * which the whole registry is queryable as ANSI SQL (`spark.sql(...)`)
  * and discoverable via `spark.catalog.listTables` / `SHOW TABLES` —
  * closing the gap between the reference's notebook-interactive surface
  * and the engine's API-first one. Views are lazy table descriptors
  * (schema from the parquet footer); no data is read at registration,
  * and every query through a view gets the same pushdown/pruning as the
  * DataFrame path (NotebookSurfaceSpec pins SQL ≡ API results).
  */
object NotebookSurface {

  /** Register silver+gold parquet artifacts as temp views; returns the
    * view names in registration order.
    */
  def registerViews(spark: SparkSession, lake: LakePaths): Seq[String] =
    Seq("silver", "gold").flatMap { layer =>
      Layers.listParquet(spark, s"${lake.root}/$layer").sorted.map { path =>
        val base = path.split('/').last.stripSuffix(".parquet")
          .replaceAll("[^A-Za-z0-9_]", "_")
        val name = s"${layer}_$base"
        spark.read.parquet(path).createOrReplaceTempView(name)
        name
      }
    }
}
