package graft.streaming

import graft.SparkSpec
import graft.ext.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming decontamination gate: documents overlapping the static
  * eval set land in quarantine (with the overlap count), the rest in the
  * clean sink — and the split must equal the BATCH q79 operator run over
  * everything the stream has seen.
  */
class DecontaminationStreamSpec extends SparkSpec {

  private def doc(words: String*): String = words.mkString(" ")
  private val evalText = doc((1 to 20).map(i => s"eval$i"): _*)
  // shares a full 3-gram window range with the eval doc → contaminated
  private val leaky = doc((5 to 15).map(i => s"eval$i"): _*)
  private val cleanA = doc((1 to 20).map(i => s"alpha$i"): _*)
  private val cleanB = doc((1 to 20).map(i => s"beta$i"): _*)
  // exactly ONE shared 3-gram ("eval1 eval2 eval3" appears once) —
  // below minOverlap = 2, must stay clean
  private val grazing = doc("eval1" +: "eval2" +: "eval3" +:
    (1 to 17).map(i => s"gamma$i"): _*)

  test("stream split == batch contamination over the union of batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("decon_stream")
    val (cleanP, quarP, ckpt) = (s"$base/clean", s"$base/quarantine", s"$base/ckpt")
    val bench = Seq((100L, evalText)).toDF("doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    val q = DecontaminationStream.start(
      mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
      cleanP, quarP, ckpt, ngramWords = 3, minOverlap = 2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      mem.addData((1L, cleanA), (2L, leaky))
      q.processAllAvailable()
      assert(spark.read.parquet(cleanP).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(1L))
      assert(spark.read.parquet(quarP).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(2L))

      // batch 2: one clean, one single-gram grazer (stays clean at
      // minOverlap 2)
      mem.addData((3L, cleanB), (4L, grazing))
      q.processAllAvailable()
      assert(spark.read.parquet(cleanP).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(1L, 3L, 4L))
      assert(spark.read.parquet(quarP).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(2L))

      // the quarantine overlap counts equal the batch operator's over
      // the union of everything streamed
      val streamed = Seq((1L, cleanA), (2L, leaky), (3L, cleanB),
        (4L, grazing)).toDF("doc_id", "text")
      val batchFlags = TextAnalysis.contamination(streamed, bench,
          "doc_id", "text", ngramWords = 3, minOverlap = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val quarFlags = spark.read.parquet(quarP)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(quarFlags === batchFlags)
      assert(batchFlags(2L) >= 2L)
    } finally q.stop()
  }
}
