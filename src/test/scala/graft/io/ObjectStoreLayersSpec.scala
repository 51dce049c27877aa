package graft.io

import java.nio.file.Files

import graft.SparkSpec

/** S6/S7 integration: the full Layers surface — DDL, CSV/parquet write,
  * read-back, catalog listing, and BOTH copy directions — through a
  * foreign object-store scheme (`mock3://`, the s3a stand-in; see
  * [[Mock3FileSystem]]). The reference uploads local files to MinIO and
  * mirrors them to HDFS; here the same movements run scheme-to-scheme
  * through the Hadoop FS API.
  */
class ObjectStoreLayersSpec extends SparkSpec {

  test("Layers round-trips bronze→silver→gold through a foreign FS scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock3.impl", classOf[Mock3FileSystem].getName)
    val tmp = Files.createTempDirectory("mock3lake").toString
    val lake = LakePaths(s"mock3://$tmp") // mock3:///… (empty authority)

    // S8 bucket/namespace DDL on the foreign scheme
    Layers.ensure(spark, lake.bronze(""))
    Layers.ensure(spark, lake.silver(""))

    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"name-$i")).toDF("id", "name")

    // distributed CSV + parquet writes straight to the object store
    Layers.writeCsv(df, lake.bronze("raw.csv"), singleFile = true)
    Layers.writeParquet(df, lake.silver("clean.parquet"))

    // read-back over the scheme (S1 needs the declared-schema path)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    assert(Layers.readCsv(spark, lake.bronze("raw.csv"), schema).count() == 100)
    assert(Layers.readParquet(spark, lake.silver("clean.parquet")).count() == 100)

    // S9 catalog listing sees the parquet object, with the scheme intact
    val listed = Layers.listParquet(spark, s"mock3://$tmp/silver")
    assert(listed.exists(_.endsWith("clean.parquet")))
    assert(listed.forall(_.startsWith("mock3:")))

    // S6: object store → local (the reference's HDFS mirror direction)
    val localDst = Files.createTempDirectory("mock3dst").toString
    assert(Layers.copy(spark, lake.silver("clean.parquet"),
      s"file:$localDst/clean.parquet"))
    assert(spark.read.parquet(s"$localDst/clean.parquet").count() == 100)

    // S7: local → object store (the reference's upload direction)
    assert(Layers.copy(spark, s"file:$localDst/clean.parquet",
      lake.gold("promoted.parquet")))
    assert(Layers.readParquet(spark, lake.gold("promoted.parquet"))
      .count() == 100)

    // writes landed under the scheme's backing root, not the default FS
    assert(new java.io.File(s"$tmp/silver/clean.parquet").exists())
  }
}
