package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.LakeOps

/** Streaming CDC ingest: a change feed (op/seq-stamped rows) is folded into
  * a maintained snapshot, one micro-batch at a time, with
  * [[LakeOps.cdcMerge]] doing the merge inside `foreachBatch`.
  *
  * Snapshot layout — versioned, Delta-style in miniature: each batch writes
  * a full new version directory `v<epochId>` and then atomically swaps the
  * `_latest` pointer file. Readers resolve the pointer and never see a
  * half-written version; a crashed batch leaves a dangling directory, not
  * a corrupt snapshot, and the replayed batch is IDEMPOTENT (merging the
  * same latest-wins changes into the already-merged base reproduces the
  * same rows).
  *
  * Scale notes: cdcMerge keeps the snapshot's full width out of every
  * exchange (feed broadcast + key-only anti join), so per-batch cost is
  * one map-side pass over the snapshot + the tiny feed window. The
  * full-rewrite-per-batch of the version directory is the textbook
  * copy-on-write table format; for partial rewrites partition the
  * snapshot and rewrite only partitions containing changed keys.
  */
object CdcIngest {

  private def pointerPath(snapshotDir: String) = s"$snapshotDir/_latest"

  /** Resolve the current snapshot version directory, if any. */
  def latestVersion(snapshotDir: String): Option[String] = {
    val p = Paths.get(pointerPath(snapshotDir))
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  /** Read the current snapshot (None before the first batch commits). */
  def readSnapshot(spark: SparkSession, snapshotDir: String): Option[DataFrame] =
    latestVersion(snapshotDir).map(v => spark.read.parquet(s"$snapshotDir/$v"))

  /** All retained version names, oldest first (v3 sorts after v10 never
    * matters: epoch ids are monotone, compare numerically).
    */
  def versions(snapshotDir: String): Seq[String] = {
    val d = new java.io.File(snapshotDir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName)
      .sortBy(_.drop(1).toLong)
  }

  /** Time travel: read a specific retained version (AS OF semantics). */
  def readVersion(spark: SparkSession, snapshotDir: String, version: String): DataFrame = {
    require(versions(snapshotDir).contains(version),
      s"version $version not retained in $snapshotDir (have: ${versions(snapshotDir)})")
    spark.read.parquet(s"$snapshotDir/$version")
  }

  /** Retention: drop all but the newest `keep` versions. The `_latest`
    * pointer's version is always retained (a vacuum can never unlink the
    * live snapshot, even if `keep` is smaller than the history).
    */
  def vacuum(snapshotDir: String, keep: Int = 2): Seq[String] = {
    require(keep >= 1, "must retain at least the live version")
    val live = latestVersion(snapshotDir).toSet
    val victims = versions(snapshotDir).dropRight(keep).filterNot(live)
    victims.foreach { v =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$snapshotDir/$v"))
    }
    victims
  }

  /** Atomic pointer swap: write aside, then rename over `_latest`. */
  private[streaming] def commit(snapshotDir: String, version: String): Unit = {
    val tmp = Paths.get(s"${pointerPath(snapshotDir)}.tmp")
    Files.createDirectories(Paths.get(snapshotDir))
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(pointerPath(snapshotDir)),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Start the ingest: drains the available change feed (AvailableNow),
    * merging each micro-batch into the snapshot. Restarting with the same
    * checkpoint resumes from the recorded offsets — already-applied
    * batches are not re-read, and a replayed partial batch re-merges
    * idempotently.
    */
  def cdcSnapshotStream(
      changes: DataFrame,
      snapshotDir: String,
      checkpointDir: String,
      keyCol: String,
      seqCol: String = "op_seq",
      opCol: String = "op"
  ): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val base = readSnapshot(spark, snapshotDir)
          .getOrElse(batch.drop(seqCol, opCol).limit(0))
        val merged = LakeOps.cdcMerge(base, batch, keyCol, seqCol, opCol)
        merged.write.mode("overwrite").parquet(s"$snapshotDir/v$epochId")
        commit(snapshotDir, s"v$epochId")
      }
      .start()

  /** One SCD2 micro-batch: merge a feed increment into the versioned
    * dimension with [[LakeOps.scd2Merge]] (first batch bootstraps via a
    * merge into the empty dimension — same code path). Public so specs
    * and batch backfills can drive it directly.
    *
    * Replay guard: scd2Merge is NOT idempotent (re-merging an increment
    * would re-append its versions), so a batch whose epoch is already
    * committed — a foreachBatch replay after a crash between the pointer
    * swap and the offset commit — is SKIPPED by epoch number (epoch ids
    * are monotone per checkpoint).
    */
  def mergeDimBatch(
      batch: DataFrame,
      dimDir: String,
      epochId: Long,
      keyCols: Seq[String],
      orderCols: Seq[String],
      attrCols: Seq[String]
  ): Unit = {
    if (versions(dimDir).exists(_.drop(1).toLong >= epochId)) return
    val spark = batch.sparkSession
    val base = readSnapshot(spark, dimDir)
      .getOrElse(LakeOps.scd2(batch.limit(0), keyCols, orderCols, attrCols))
    val merged = LakeOps.scd2Merge(base, batch, keyCols, orderCols, attrCols)
    merged.write.mode("overwrite").parquet(s"$dimDir/v$epochId")
    commit(dimDir, s"v$epochId")
  }

  /** Streaming SCD2 dimension maintenance: each micro-batch of feed
    * observations is merged into the dimension snapshot — history rows
    * pass through untouched, windows run only over the increment (the
    * [[LakeOps.scd2Merge]] scale contract), and every epoch leaves a
    * time-travelable version directory behind the atomic `_latest`
    * pointer.
    *
    * Ordering contract (inherited from scd2Merge): the source must
    * deliver each key's observations in non-retrograde order across
    * batches — i.e. everything in batch N+1 sorts after the key's rows
    * in batches ≤ N. File/Kafka sources partitioned by ingest time
    * satisfy this for append-only feeds.
    */
  def scd2DimStream(
      feed: DataFrame,
      dimDir: String,
      checkpointDir: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      attrCols: Seq[String]
  ): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        mergeDimBatch(batch, dimDir, epochId, keyCols, orderCols, attrCols)
      }
      .start()
}
