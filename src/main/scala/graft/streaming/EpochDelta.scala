package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE index protocol shared by the streaming dedup gates (VERDICT r9
  * #2 — one protocol, two funnels): state lives as per-epoch DELTA
  * directories `root/v<epoch>`, each written with mode=overwrite, so
  *
  *  - writes are O(batch) per epoch (never an index rewrite),
  *  - a replayed epoch overwrites its own directory with byte-identical
  *    content (exactly-once without an epoch guard, PROVIDED the gate's
  *    accepted set is pairwise non-colliding — both funnels guarantee
  *    it: DedupStream by the pairwise-lowest-id rule, CurationStream by
  *    connected-components representatives),
  *  - readers take the union of COMMITTED deltas only: a crash
  *    mid-first-write can leave `v0` holding just `_temporary`, and a
  *    glob read over that would fail schema inference on the very
  *    replay the protocol exists to survive.
  */
private[streaming] object EpochDelta {

  /** Delta directories that contain JOB-committed output: the `_SUCCESS`
    * marker is required. A bare part- file without `_SUCCESS` means the
    * crash landed between task commit and job commit — the streaming flow
    * replays (and overwrites) that epoch before any later epoch reads, but
    * a BATCH caller of readAll after such a crash would otherwise observe
    * partial state (r10 ADVICE). Dirs written by a non-committer path
    * (none of ours) would need the part- fallback; we deliberately do not
    * keep one — partial state is worse than a missed pre-existing dir.
    */
  def committedDeltas(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .filter { s =>
        fs.exists(new Path(s.getPath, "_SUCCESS")) &&
        fs.listStatus(s.getPath).exists(_.getPath.getName.startsWith("part-"))
      }
      .map(_.getPath.toString)
  }

  /** The union of all committed deltas, or None when none exist yet. */
  def readAll(spark: SparkSession, root: String): Option[DataFrame] = {
    val dirs = committedDeltas(spark, root)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** This epoch's delta — an overwrite, so replays reconverge. */
  def writeDelta(df: DataFrame, root: String, epochId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/v$epochId")
}
