package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming half of the incremental-dedup ingest (q74's steady-state
  * shape, driven by Structured Streaming): each micro-batch of documents is
  *
  *   1. exact-deduped within the batch (content hash, keep lowest id),
  *   2. near-dup-deduped within the batch (minhash pairs → connected
  *      components → keep lowest id),
  *   3. checked against the PERSISTED signature index — the historical
  *      corpus as one (id, signature) row per document; corpus text is
  *      never re-read — and matches are dropped,
  *   4. appended to the curated output, with the survivors' signatures
  *      appended to the index so the NEXT batch dedups against them.
  *
  * Exactly-once caveat (standard foreachBatch): source offsets are
  * checkpointed, but the two appends are not transactional with them. A
  * batch replayed after a mid-batch failure re-checks against signatures it
  * may itself have appended — the `id_new =!= id_corpus` guard keeps a
  * replayed document from matching ITSELF, so signature re-appends are
  * harmless for dedup decisions (duplicate index rows only add band-join
  * work; compact the index offline). The curated sink can carry duplicate
  * files after a crash mid-append — at lake scale write it via a
  * transactional table format or dedup downstream on `idCol`.
  */
object CurationStream {

  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      checkpointPath: String,
      threshold: Double = 0.7,
      nHashes: Int = 64,
      bands: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, textCol, indexPath, outPath,
          threshold, nHashes, bands)
      }
      .start()

  /** One micro-batch of the ingest, also usable as a batch-mode call. */
  def processBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      threshold: Double,
      nHashes: Int,
      bands: Int
  ): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      if (b.isEmpty) return
      val exact = Dedup.exact(b, idCol, Seq(textCol))
      val intraPairs =
        Dedup.minHashPairs(exact, idCol, textCol, threshold, nHashes, bands)
      val intraRemoved = Dedup.clusterIds(intraPairs)
        .filter(col("cluster_id") =!= col("id"))
        .select(col("id").as(idCol))
      val intra = exact.join(intraRemoved, Seq(idCol), "left_anti")

      val idx = new Path(indexPath)
      val fs = idx.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val survivors =
        if (!fs.exists(idx)) intra
        else {
          val corpusSigs = spark.read.parquet(indexPath)
          val hits = Dedup.minHashPairsAgainstIndex(
              intra, idCol, textCol, corpusSigs, threshold, nHashes, bands)
            .filter(col("id_new") =!= col("id_corpus")) // replay self-guard
            .select(col("id_new").as(idCol)).distinct()
          intra.join(hits, Seq(idCol), "left_anti")
        }

      val out = survivors.persist()
      try {
        out.write.mode("append").parquet(outPath)
        Dedup.minHashSignatures(out, idCol, textCol, nHashes)
          .write.mode("append").parquet(indexPath)
      } finally { out.unpersist(); () }
    } finally { b.unpersist(); () }
  }
}
