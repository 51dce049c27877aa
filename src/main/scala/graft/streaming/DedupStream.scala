package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming NEAR-DUPLICATE gate, the EXACTLY-ONCE sibling of
  * [[CurationStream]]: documents stream in, are MinHash-LSH probed
  * against the PERSISTED signature index of everything accepted so far,
  * and split into an accepted sink and a rejects sink (with the
  * colliding corpus id and the Jaccard estimate — the audit channel
  * CurationStream's curated-only output lacks). The probe is q74's
  * [[Dedup.minHashPairsAgainstIndex]] in both.
  *
  * Where CurationStream documents an at-least-once caveat (plain
  * appends: a crash mid-batch can leave duplicate sink files and
  * duplicate index rows), this gate closes it: EVERY write is an
  * epoch-versioned overwrite — verdicts to `verdictDir/{accepted,
  * rejects}/v<epoch>` and the index as per-epoch DELTA directories
  * `indexPath/v<epoch>` (read back as one glob). Writes stay O(batch)
  * per epoch — no index rewrite — and a replayed epoch overwrites its
  * own directories with byte-identical content.
  *
  * Batch-internal collisions resolve FIRST, pairwise by lowest id (a
  * batch can near-duplicate itself); survivors then probe the index.
  * PAIRWISE, not sequential-greedy, is intentional and load-bearing: a
  * doc is rejected if it collides with ANY lower id, even one that was
  * itself rejected (chain 1~2, 2~3, 1!~3 rejects BOTH 2 and 3, where
  * greedy keep-first would keep 3). That strictness is what keeps the
  * verdict a pure per-pair function of the batch — order-free, hence
  * replayable — and it means a reject's `dup_of` names the lowest
  * COLLIDING id, which may itself be a reject; resolve chains through
  * the rejects sink if the audit consumer needs an accepted target.
  * The accepted set is therefore pairwise non-colliding at the estimate
  * threshold, which is what makes replay reconverge with NO epoch
  * guard (the SketchStream-KMV side of the contrast, not the SCD2/CMS
  * side): on replay, accepted docs self-match their own indexed
  * signature (excluded by id), cannot collide with co-accepted
  * batchmates, and see the same older corpus — identical verdicts,
  * identical delta, overwritten in place. DedupStreamSpec pins the
  * replay bit-for-bit.
  *
  * Scale shape per batch: signatures are computed scan-side (native
  * `minhash_signature`, one pass per doc); the index probe is the q25
  * banding equi-join — band keys and 8-byte hashes shuffle, never text —
  * and the index side is (id, signature), k longs per accepted doc.
  * State grows with ACCEPTED docs only (rejects never enter the index);
  * compact old delta directories offline like any lake table.
  */
object DedupStream {

  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      verdictDir: String,
      checkpointPath: String,
      threshold: Double = 0.7,
      nHashes: Int = 64,
      bands: Int = 16,
      shingleWords: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        processBatch(batch, epochId, idCol, textCol, indexPath, verdictDir,
          threshold, nHashes, bands, shingleWords)
      }
      .start()

  /** One micro-batch: within-batch resolve → index probe → verdicts +
    * index append. Also usable as a batch-mode call (the incremental
    * q74 step); replay-idempotent, see the object scaladoc.
    */
  def processBatch(
      batch: DataFrame,
      epochId: Long,
      idCol: String,
      textCol: String,
      indexPath: String,
      verdictDir: String,
      threshold: Double,
      nHashes: Int,
      bands: Int,
      shingleWords: Int
  ): Unit = {
    val b = batch.persist()
    try {
      if (b.isEmpty) return
      val spark = b.sparkSession
      val sigs = Dedup
        .minHashSignatures(b, idCol, textCol, nHashes, shingleWords)
        .persist()
      try {
        // 1. within-batch: a doc colliding with a LOWER id loses — the
        //    greedy keep-lowest rule every dedup op here uses; the
        //    survivor set is pairwise non-colliding by construction
        val within = Dedup.minHashPairsAgainstIndex(
            b, idCol, textCol, sigs, threshold, nHashes, bands, shingleWords)
          .filter(col("id_corpus") < col("id_new"))
          .groupBy(col("id_new").as(idCol))
          .agg(min(col("id_corpus")).as("dup_of"),
            max(col("est_jaccard")).as("est_jaccard"))
        val batchSurvivors = b.join(within.select(idCol), Seq(idCol),
          "left_anti").persist()
        // 2. survivors probe the persisted index (the union of every
        //    epoch's delta); the id inequality is the replay self-guard
        //    (an accepted doc's own signature is already indexed when a
        //    batch re-runs)
        // EpochDelta.readAll sees COMMITTED deltas only: a crash
        // mid-flight can leave v<k> holding just `_temporary`, and a
        // glob read over that would fail schema inference on the very
        // replay the design is meant to survive.
        val vsIndex = EpochDelta.readAll(spark, indexPath) match {
          case None => within.limit(0)
          case Some(index) => Dedup.minHashPairsAgainstIndex(
              batchSurvivors, idCol, textCol,
              index, threshold, nHashes, bands, shingleWords)
            .filter(col("id_new") =!= col("id_corpus"))
            .groupBy(col("id_new").as(idCol))
            .agg(min(col("id_corpus")).as("dup_of"),
              max(col("est_jaccard")).as("est_jaccard"))
        }
        val rejects = within.unionByName(vsIndex).persist()
        try {
          val accepted = batchSurvivors
            .join(rejects.select(idCol), Seq(idCol), "left_anti")
            .persist()
          try {
            // 3. epoch-versioned verdict sinks: replays overwrite with
            //    identical content (no append duplication). Writing them
            //    FIRST also materializes the index probe before step 4
            //    overwrites the delta directory the probe may be reading
            //    (replay case).
            EpochDelta.writeDelta(rejects, s"$verdictDir/rejects", epochId)
            EpochDelta.writeDelta(accepted, s"$verdictDir/accepted", epochId)
            // 4. the index DELTA: this epoch's accepted signatures only —
            //    O(batch) written per epoch, never an index rewrite; a
            //    replay overwrites the same directory with the same rows
            EpochDelta.writeDelta(
              sigs.join(accepted.select(idCol), Seq(idCol), "left_semi"),
              indexPath, epochId)
          } finally { accepted.unpersist(); () }
        } finally { rejects.unpersist(); () }
        batchSurvivors.unpersist()
        ()
      } finally { sigs.unpersist(); () }
    } finally { b.unpersist(); () }
  }

  /** Everything the gate has accepted so far (the union of the epoch
    * sinks), for assertions and downstream consumption.
    */
  def acceptedSoFar(spark: SparkSession, verdictDir: String): DataFrame =
    spark.read.parquet(s"$verdictDir/accepted/v*")
}
