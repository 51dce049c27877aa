package graft.queries

import graft.SparkSpec
import java.time.LocalDateTime

/** The bucketed out-of-order census must agree with a naive sequential scan
  * for ANY bucket count — in particular the cross-bucket boundary pairs
  * (last row of one bucket vs first row of the next) and sparse/empty
  * buckets must be handled exactly.
  */
class OutOfOrderCensusSpec extends SparkSpec {

  // event ids deliberately sparse (gaps → empty buckets); ts scrambled so
  // inversions occur both inside buckets and exactly at bucket boundaries
  private def mkEvents(rows: Seq[(Long, LocalDateTime)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast("timestamp_ntz"))
  }

  private def naive(rows: Seq[(Long, LocalDateTime)]): (Long, Option[Long], Long) = {
    val sorted = rows.sortBy(_._1)
    val pairs = sorted.zip(sorted.drop(1))
    val inv = pairs.count { case ((_, p), (_, c)) => c.isBefore(p) }
    val backsteps = pairs.map { case ((_, p), (_, c)) =>
      java.time.Duration.between(c, p).toNanos / 1000 }
    (inv.toLong, backsteps.maxOption, sorted.length.toLong)
  }

  private val base = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
  // distinct sparse ids (37·i mod 221); ts mostly increasing but scrambled
  // with a deterministic backstep every 5th row and one huge final backstep
  private val rows: Seq[(Long, LocalDateTime)] =
    (0 until 60).map { i =>
      val id = i.toLong * 37 % 221 // permuted, sparse, all distinct
      val jitter = if (i % 5 == 0) -90L else 0L
      (id, base.plusSeconds(id * 10 + jitter))
    } :+ (10007L, base.minusHours(2)) // far-out id, very early ts

  test("bucketed census equals the sequential scan for any bucket count") {
    val (inv, maxBs, n) = naive(rows)
    for (buckets <- Seq(1L, 2L, 7L, 64L, 1000L)) {
      val got = EventQueries
        .outOfOrderCensus(mkEvents(rows), Some(buckets)).head()
      assert(got.getLong(0) == inv, s"inversions at nBuckets=$buckets")
      assert((if (got.isNullAt(1)) None else Some(got.getLong(1))) == maxBs,
        s"max backstep at nBuckets=$buckets")
      assert(got.getLong(2) == n, s"n_events at nBuckets=$buckets")
    }
  }

  test("degenerate inputs: empty and single-row") {
    val empty = mkEvents(Nil)
    val e = EventQueries.outOfOrderCensus(empty, Some(4L)).head()
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.getLong(2) == 0L)

    val one = EventQueries
      .outOfOrderCensus(mkEvents(Seq((7L, base))), Some(4L)).head()
    assert(one.getLong(0) == 0L && one.isNullAt(1) && one.getLong(2) == 1L)
  }
}
