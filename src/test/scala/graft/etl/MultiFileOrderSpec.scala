package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keep-first dedup over a MULTI-file bronze directory must match pandas'
  * `pd.concat([read(f) for f in sorted(glob)]).drop_duplicates(keep="first")`
  * — i.e. survivors come from the lexicographically-first file, first row.
  *
  * The fixture is adversarial for the old `monotonically_increasing_id`
  * order: file sizes are INVERSE to name order, so Spark's size-descending
  * bin-packing scans the LAST file first and bare mid() would keep the
  * wrong row. (reference semantics: clean_traffic.py:66-72)
  */
class MultiFileOrderSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType)))

  /** Three CSV files; every key appears in every file; the pandas-correct
    * survivor for key k is "a:<k>" (file a.csv, its first occurrence).
    * a.csv is tiny, c.csv is big → size order c,b,a ≠ name order a,b,c.
    */
  private def writeCsvBronze(): String = {
    val dir = Files.createTempDirectory("graft_multifile_csv")
    def write(name: String, rows: Seq[String]): Unit =
      Files.write(dir.resolve(name), ("k,v" +: rows).mkString("\n").getBytes)
    write("a.csv", (0L until 5L).flatMap(k => Seq(s"$k,a:$k", s"$k,a-dup:$k")))
    write("b.csv", (0L until 50L).map(k => s"$k,b:$k"))
    write("c.csv", (0L until 500L).map(k => s"$k,c:$k"))
    dir.toString
  }

  test("CSV multi-file keep-first matches pandas concat(sorted) order") {
    val dir = writeCsvBronze()
    val raw = spark.read.schema(schema).option("header", "true").csv(dir)
    // sanity: the scan really is multi-file and size-reordered
    val firstScanned = raw.limit(1).select("v").head().getString(0)
    val out = Cleaning.dedupKeepFirst(raw, "k")
      .select("k", "v").orderBy("k").collect()
    assert(out.length == 500)
    (0L until 5L).foreach { k =>
      assert(out(k.toInt).getString(1) == s"a:$k",
        s"key $k survivor should be a.csv's first row (scan started at " +
          s"$firstScanned)")
    }
    assert(out(7).getString(1) == "b:7") // keys only in b+c → b wins
    assert(out(100).getString(1) == "c:100") // keys only in c
  }

  test("parquet multi-file keep-first matches pandas concat(sorted) order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_multifile_pq")
    def write(name: String, n: Long, tag: String): Unit = {
      val tmp = Files.createTempDirectory("graft_mf_stage").toString
      (0L until n).map(k => (k, s"$tag:$k")).toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), dir.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    write("a.parquet", 5L, "a")
    write("b.parquet", 50L, "b")
    write("c.parquet", 2000L, "c")
    val out = Cleaning.dedupKeepFirst(spark.read.parquet(dir.toString), "k")
      .select("k", "v").orderBy("k").collect()
    assert(out.length == 2000)
    (0L until 5L).foreach(k => assert(out(k.toInt).getString(1) == s"a:$k"))
    assert(out(20).getString(1) == "b:20")
    assert(out(999).getString(1) == "c:999")
  }

  test("single in-memory frame still dedups keep-first (fallback path)") {
    import spark.implicits._
    val df = Seq((1L, "first"), (1L, "second"), (2L, "only"))
      .toDF("k", "v").coalesce(1)
    val out = Cleaning.dedupKeepFirst(df, "k").orderBy("k").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("first", "only"))
  }
}
