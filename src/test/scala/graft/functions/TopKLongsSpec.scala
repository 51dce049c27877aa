package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKLongsSpec extends SparkSpec {
  import spark.implicits._

  test("smallest-k ascending, duplicates kept, short input short output") {
    val df = Seq(5L, 3L, 9L, 3L, 7L, 1L).toDF("v").repartition(3)
    val r = df.agg(GraftFunctions.topKLongs(col("v"), 4).as("t"))
      .as[Seq[Long]].collect().head
    assert(r == Seq(1L, 3L, 3L, 5L))
    val short = Seq(2L, 8L).toDF("v")
      .agg(GraftFunctions.topKLongs(col("v"), 5).as("t"))
      .as[Seq[Long]].collect().head
    assert(short == Seq(2L, 8L))
    val empty = Seq.empty[Long].toDF("v")
      .agg(GraftFunctions.topKLongs(col("v"), 3).as("t"))
      .as[Seq[Long]].collect().head
    assert(empty.isEmpty)
  }

  test("grouped + partial merge agrees with sort-and-take; SQL form works") {
    val rng = new scala.util.Random(3)
    val rows = (0 until 5000).map(i => (i % 7L, rng.nextLong() % 100000L))
    val df = rows.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(GraftFunctions.topKLongs(col("v"), 5).as("t"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.take(5)
    }
    assert(got == want)
    df.createOrReplaceTempView("tkl")
    val viaSql = spark.sql(
      "SELECT g, top_k_longs(v, 5) AS t FROM tkl GROUP BY g")
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql == want)
  }

  test("k = 32 and k = 64 (past the old 16-slot cap): merge-exact vs " +
      "sort-and-take across many partitions") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 20000).map(i => (i % 5L, rng.nextLong() % 1000000L))
    val df = rows.toDF("g", "v").repartition(16)
    Seq(32, 64).foreach { k =>
      val got = df.groupBy("g")
        .agg(GraftFunctions.topKLongs(col("v"), k).as("t"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).sorted.take(k)
      }
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("nulls are skipped") {
    val df = Seq(Some(4L), None, Some(2L), None, Some(9L)).toDF("v")
    val r = df.agg(GraftFunctions.topKLongs(col("v"), 2).as("t"))
      .as[Seq[Long]].collect().head
    assert(r == Seq(2L, 4L))
  }
}
