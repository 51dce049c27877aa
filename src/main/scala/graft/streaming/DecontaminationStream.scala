package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.TextAnalysis

/** Streaming benchmark-DECONTAMINATION gate: documents stream in, are
  * checked for word-n-gram overlap against a STATIC eval set (the q79
  * operator — native gram hashing, eval grams broadcast), and split into
  * a clean sink and a quarantine sink (with the overlap count) as they
  * arrive — the ingest-time guard against test-set leakage, instead of
  * the batch sweep.
  *
  * Statelessness is the point: contamination of a document depends only
  * on the document and the FIXED eval set, so each micro-batch is
  * self-contained — no streaming state store, no watermark, and replays
  * after a mid-commit failure rewrite the same rows (at-least-once on
  * the plain-append sinks; dedup downstream on `idCol`, use a
  * transactional table format at lake scale, or adopt the EpochDelta
  * overwrite protocol the dedup gates use).
  *
  * Scale shape per batch == q79's: eval grams are a broadcast distinct
  * hash set built ONCE up front (not per batch); batch text never
  * shuffles — only matched 8-byte hashes reach the per-doc count.
  */
object DecontaminationStream {

  def start(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      cleanPath: String,
      quarantinePath: String,
      checkpointPath: String,
      ngramWords: Int = 8,
      minOverlap: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    // materialize the eval-set gram hashes once — every batch reuses the
    // same tiny localCheckpoint instead of re-hashing the bench corpus
    val benchGrams = TextAnalysis.benchGramHashes(bench, textCol, ngramWords)
      .localCheckpoint(true)
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, benchGrams, idCol, textCol,
          cleanPath, quarantinePath, ngramWords, minOverlap)
      }
      .start()
  }

  /** One micro-batch: flag → quarantine append + clean append. Also
    * usable as a batch-mode call (`benchGrams` from
    * [[TextAnalysis.benchGramHashes]]).
    */
  def processBatch(
      batch: DataFrame,
      benchGrams: DataFrame,
      idCol: String,
      textCol: String,
      cleanPath: String,
      quarantinePath: String,
      ngramWords: Int,
      minOverlap: Int
  ): Unit = {
    val b = batch.persist()
    try {
      if (b.isEmpty) return
      val flagged = TextAnalysis.contaminationAgainstGrams(
          b, benchGrams, idCol, textCol, ngramWords, minOverlap)
        .persist()
      try {
        flagged.write.mode("append").parquet(quarantinePath)
        b.join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
          .write.mode("append").parquet(cleanPath)
      } finally { flagged.unpersist(); () }
    } finally { b.unpersist(); () }
  }
}
