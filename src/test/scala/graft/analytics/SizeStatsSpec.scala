package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A13 coverage: the deterministic deep-size model (memoryUsage) and the
  * footer-only physical size readout (sizeStats).
  */
class SizeStatsSpec extends SparkSpec {
  import spark.implicits._

  test("memoryUsage: deterministic deep-size model per column") {
    val df = Seq(
      (1L, Some(7), "ab", Seq(1.0f, 2.0f)),
      (2L, None, "cde", Seq(3.0f)),
      (3L, Some(9), null, Seq.empty[Float])
    ).toDF("id", "i", "s", "v")
    val out = Summary.memoryUsage(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("id") == (3L, 24L))  // 3 longs x 8
    assert(out("i") == (2L, 8L))    // 2 non-null ints x 4
    assert(out("s") == (2L, 5L))    // "ab" + "cde" utf-8 bytes
    assert(out("v") == (3L, 12L))   // 3 float elements x 4
    // column order is deterministic (sorted by name)
    assert(Summary.memoryUsage(df).collect().map(_.getString(0)).toSeq ==
      Seq("i", "id", "s", "v"))
  }

  test("memoryUsage: multi-byte utf-8 counts octets, not codepoints") {
    val df = Seq("é", "日本").toDF("t") // 2 + 6 utf-8 bytes
    val r = Summary.memoryUsage(df).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 8L)
  }

  test("sizeStats: footer-only readout matches the written table") {
    val dir = java.nio.file.Files.createTempDirectory("sizestats").toString
    val n = 1000L
    spark.range(n).select(col("id"), (col("id") * 2).as("v"),
        concat(lit("row-"), col("id")).as("s"))
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/t1")
    val out = Summary.sizeStats(spark, Map("t1" -> s"$dir/t1")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "t1")
    assert(r.getLong(1) == 3L)       // n_files = repartition width
    assert(r.getLong(2) == n)        // footer row count == actual rows
    assert(r.getLong(3) > 0L)        // compressed bytes
    assert(r.getLong(4) >= r.getLong(3) / 2) // uncompressed is same order
    assert(r.getLong(5) > 0L)        // Catalyst plan estimate present
    // the footer pass never reads data pages: compressed bytes is well
    // below the raw file size ceiling yet nonzero — and row counts agree
    // with a real scan
    assert(spark.read.parquet(s"$dir/t1").count() == n)
  }
}
