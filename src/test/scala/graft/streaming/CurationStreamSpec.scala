package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming incremental-dedup ingest on the shared EpochDelta
  * protocol: batch 2 must dedup against batch 1's PERSISTED signatures
  * (corpus text gone), within-batch exact + near-dup survivors collapse
  * to the lowest id, and a replayed epoch reconverges bit-for-bit.
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
      val after1 = CurationStream.curatedSoFar(spark, outP)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(after1 == Set(1L, 2L))
      assert(spark.read.parquet(s"$idxP/v*").count() == 2,
        "2 signatures persisted")

      // batch 2: near-copy of doc 1 (vs INDEX), a new doc, and an exact
      // in-batch copy of that new doc
      mem.addData((3L, textAnear), (4L, textD), (5L, textD))
      q.processAllAvailable()
      val after2 = CurationStream.curatedSoFar(spark, outP)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(after2 == Set(1L, 2L, 4L),
        s"3 (near-dup of corpus) and 5 (exact in-batch dup) must drop: $after2")
      assert(spark.read.parquet(s"$idxP/v*").count() == 3,
        "only survivors indexed")
    } finally q.stop()
  }

  test("replayed epoch reconverges bit-for-bit on the shared EpochDelta " +
    "protocol (the former at-least-once caveat is gone)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("curation_replay")
    val (idxP, outP) = (s"$base/index", s"$base/out")
    def run(epoch: Long, rows: Seq[(Long, String)]): Unit =
      CurationStream.processBatch(rows.toDF("doc_id", "text"), epoch,
        "doc_id", "text", idxP, outP, threshold = 0.7, nHashes = 64,
        bands = 16)
    def snapshot(): (Set[(Long, Seq[Long])], Set[Long]) = (
      spark.read.parquet(s"$idxP/v*").collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          r.getSeq[Long](r.fieldIndex("signature")).toSeq).toSet,
      CurationStream.curatedSoFar(spark, outP)
        .select("doc_id").collect().map(_.getLong(0)).toSet)

    run(0L, Seq((1L, textA), (2L, textAnear), (3L, textB)))
    val first = snapshot()
    assert(first._2 === Set(1L, 3L), "2 collapses into 1's cluster")
    // mid-commit-crash replay: the index already holds this epoch's
    // delta; survivors self-match (excluded by id), CC representatives
    // are pairwise non-colliding — identical output, overwritten in place
    run(0L, Seq((1L, textA), (2L, textAnear), (3L, textB)))
    assert(snapshot() === first)

    // uncommitted-v0 crash edge shared with DedupStream: scratch-only
    // delta dirs are invisible to the index read
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$idxP/v99/_temporary/0"))
    run(1L, Seq((4L, textAnear), (5L, textD)))
    val after = snapshot()
    assert(after._2 === Set(1L, 3L, 5L), "4 rejected via the index")
  }
}
