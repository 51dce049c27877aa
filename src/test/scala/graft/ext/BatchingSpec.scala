package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation.lengthBucketBatching: power-of-two bucket assignment, integer
  * padding/batch math, and the ~global pad-to-max comparison row.
  */
class BatchingSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: buckets, waste, and batch counts") {
    // token counts: 10, 16, 17, 100 → buckets 16, 16, 32, 128; max=100
    val docs = Seq(
      "a " * 9 + "a", // 10 tokens
      "b " * 15 + "b", // 16
      "c " * 16 + "c", // 17
      "d " * 99 + "d" // 100
    ).toDF("text")
    val out = Curation.lengthBucketBatching(docs, "text", batchTokens = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(7)))
    // rows ordered by bucket_label: b016, b032, b128, ~global
    assert(out.toSeq == Seq(
      // label, bucket, n_docs, sum, padded, waste, n_batches
      ("b016", 16L, 2L, 26L, 32L, 6L, 1L), // 64/16 = 4 rows/batch → 1
      ("b032", 32L, 1L, 17L, 32L, 15L, 1L), // 64/32 = 2 → 1
      ("b128", 128L, 1L, 100L, 128L, 28L, 1L), // budget < bucket → 1/batch
      ("~global", 100L, 4L, 143L, 400L, 257L, 4L))) // 1 row/batch → 4
  }

  test("overflow docs chunk into segments: waste never negative") {
    // 600 tokens > top bucket 256 → 3 segments of 256 → padded 768,
    // waste 168; plus one small doc in b016
    val docs = Seq("x " * 599 + "x", "y y y").toDF("text")
    val out = Curation.lengthBucketBatching(docs, "text",
        batchTokens = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(7)))
    assert(out.toSeq == Seq(
      ("b016", 16L, 1L, 3L, 16L, 13L, 1L),
      ("b256", 256L, 1L, 600L, 768L, 168L, 1L), // 3 segs, 16 segs/batch
      ("~global", 600L, 2L, 603L, 1200L, 597L, 1L)))
    out.foreach { case (_, _, _, _, _, waste, _) => assert(waste >= 0L) }
  }
}
