package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming incremental-dedup ingest: batch 2 must dedup against
  * batch 1's PERSISTED signatures (corpus text gone), and within-batch
  * exact + near-dup survivors must collapse to the lowest id.
  */
class CurationStreamSpec extends SparkSpec {

  private def doc(words: String*): String = words.mkString(" ")

  // ~20-word documents so 3-word shingles are plentiful
  private val textA = doc((1 to 20).map(i => s"alpha$i"): _*)
  private val textAnear = doc(((1 to 19).map(i => s"alpha$i") :+ "CHANGED"): _*)
  private val textB = doc((1 to 20).map(i => s"beta$i"): _*)
  private val textD = doc((1 to 20).map(i => s"delta$i"): _*)

  test("batch N+1 dedups against batch N via the signature index only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("curation_stream")
    val (idxP, outP, ckpt) = (s"$base/index", s"$base/out", s"$base/ckpt")

    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.start(
      mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idxP, outP, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // batch 1: two distinct docs
      mem.addData((1L, textA), (2L, textB))
      q.processAllAvailable()
      val after1 = spark.read.parquet(outP).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after1 == Set(1L, 2L))
      assert(spark.read.parquet(idxP).count() == 2, "2 signatures persisted")

      // batch 2: near-copy of doc 1 (vs INDEX), a new doc, and an exact
      // in-batch copy of that new doc
      mem.addData((3L, textAnear), (4L, textD), (5L, textD))
      q.processAllAvailable()
      val after2 = spark.read.parquet(outP).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(after2 == Set(1L, 2L, 4L),
        s"3 (near-dup of corpus) and 5 (exact in-batch dup) must drop: $after2")
      assert(spark.read.parquet(idxP).count() == 3, "only survivors indexed")
    } finally q.stop()
  }
}
