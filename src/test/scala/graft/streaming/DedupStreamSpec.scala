package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming near-dup gate: within-batch collisions resolve to the
  * lowest id, survivors probe the persisted signature index, accepted
  * docs extend the index — and a replayed batch must reconverge to the
  * identical verdicts and index (idempotence without an epoch guard).
  */
class DedupStreamSpec extends SparkSpec {

  private def doc(words: String*): String = words.mkString(" ")
  private val wordsA = (1 to 30).map(i => s"alpha$i")
  private val docA = doc(wordsA: _*)
  // one appended word: 28 of 29 shingles shared → J ≈ 0.97, far above
  // the 0.7 estimate cut even with the ±0.06 estimator noise
  private val docA2 = doc(wordsA :+ "tail1": _*)
  private val docA3 = doc(wordsA :+ "tail2": _*)
  private val docB = doc((1 to 30).map(i => s"beta$i"): _*)
  private val docC = doc((1 to 30).map(i => s"gamma$i"): _*)

  test("gate: within-batch lowest-id wins, index probe rejects later " +
    "epochs' near-dups, distinct docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("dedup_stream")
    val (idx, vd, ckpt) = (s"$base/index", s"$base/verdicts", s"$base/ckpt")

    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", idx, vd, ckpt,
      threshold = 0.7,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // batch 1: 2 near-dups docA (1 wins over 2) + distinct docB
      mem.addData((1L, docA), (2L, docA2), (3L, docB))
      q.processAllAvailable()
      val acc1 = DedupStream.acceptedSoFar(spark, vd)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(acc1 === Set(1L, 3L))
      val rej1 = spark.read.parquet(s"$vd/rejects/v*")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rej1 === Map(2L -> 1L)) // dup_of the lowest colliding id

      // batch 2: near-dup of epoch-1 docA via the INDEX + a fresh doc
      mem.addData((4L, docA3), (5L, docC))
      q.processAllAvailable()
      assert(DedupStream.acceptedSoFar(spark, vd)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(1L, 3L, 5L))
      val rej2 = spark.read.parquet(s"$vd/rejects/v*")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rej2 === Map(2L -> 1L, 4L -> 1L))
      // the est for the index rejection is high (J ≈ 0.93 true)
      val est4 = spark.read.parquet(s"$vd/rejects/v*")
        .filter(col("doc_id") === 4L)
        .select("est_jaccard").head().getDouble(0)
      assert(est4 >= 0.7, s"est_jaccard $est4")

      // index deltas hold EXACTLY the accepted ids' signatures
      assert(spark.read.parquet(s"$idx/v*").select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("replaying a batch reconverges: identical verdicts and index, " +
    "no epoch guard needed (the KMV-idempotence side of the contrast)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dedup_replay")
    val (idx, vd) = (s"$base/index", s"$base/verdicts")
    val b1 = Seq((1L, docA), (2L, docA2), (3L, docB)).toDF("doc_id", "text")
    def run(epoch: Long, df: org.apache.spark.sql.DataFrame): Unit =
      DedupStream.processBatch(df, epoch, "doc_id", "text", idx, vd,
        threshold = 0.7, nHashes = 64, bands = 16, shingleWords = 3)
    def snapshot(): (Set[(Long, Seq[Long])], Set[Long], Map[Long, Long]) = (
      spark.read.parquet(s"$idx/v*")
        .collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          r.getSeq[Long](r.fieldIndex("signature")).toSeq).toSet,
      DedupStream.acceptedSoFar(spark, vd)
        .select("doc_id").collect().map(_.getLong(0)).toSet,
      spark.read.parquet(s"$vd/rejects/v*")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

    run(0L, b1)
    val first = snapshot()
    assert(first._2 === Set(1L, 3L) && first._3 === Map(2L -> 1L))
    // the mid-commit-crash replay: the SAME epoch runs again with the
    // index already extended — accepted docs self-match (excluded by
    // id), co-accepted docs are pairwise non-colliding, so everything
    // reconverges bit-for-bit
    run(0L, b1)
    assert(snapshot() === first)

    // and a genuinely new epoch still builds on the replayed state
    run(1L, Seq((4L, docA3), (5L, docC)).toDF("doc_id", "text"))
    val after = snapshot()
    assert(after._2 === Set(1L, 3L, 5L))
    assert(after._3 === Map(2L -> 1L, 4L -> 1L))
  }

  test("first-delta crash edge: an uncommitted v0 (only _temporary, no " +
    "part files) is ignored on replay instead of wedging schema inference") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dedup_crash_v0")
    val (idx, vd) = (s"$base/index", s"$base/verdicts")
    // simulate a crash mid-flight on the FIRST-ever index delta write:
    // indexPath/v0 exists but holds only the committer's scratch dir
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$idx/v0/_temporary/0"))
    val b1 = Seq((1L, docA), (2L, docA2), (3L, docB)).toDF("doc_id", "text")
    DedupStream.processBatch(b1, 0L, "doc_id", "text", idx, vd,
      threshold = 0.7, nHashes = 64, bands = 16, shingleWords = 3)
    // the replay succeeded: v0 was treated as no-index, then OVERWRITTEN
    // with the real committed delta
    assert(DedupStream.acceptedSoFar(spark, vd)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(spark.read.parquet(s"$idx/v*").select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }
}
