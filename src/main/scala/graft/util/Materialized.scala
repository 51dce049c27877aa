package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of materialized intermediate artifacts — the
  * in-process analog of the table a production pipeline PERSISTS between
  * stages (the q74 incremental signature index pattern: derive the
  * verified-duplicate pair set once, let every downstream policy stage
  * consume the same artifact instead of re-deriving it).
  *
  * Contract:
  *  - [[put]] ALWAYS rebuilds and replaces — the producing stage's cost is
  *    never hidden by a stale cache (bench integrity: a re-run of the
  *    producer re-measures the full derivation);
  *  - [[getOrBuild]] consumes the latest materialization, deriving it only
  *    when no producer has run in this session (standalone correctness:
  *    every consumer is self-sufficient, just slower);
  *  - keys embed the session identity, so a new SparkSession never reads
  *    another session's (dead) checkpointed blocks.
  * Deterministic inputs ⇒ consuming the artifact and re-deriving it are
  * bit-identical; only the wall-clock differs.
  */
object Materialized {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def key(spark: SparkSession, parts: String*): String =
    (System.identityHashCode(spark).toString +: parts).mkString("|")

  /** Rebuild, materialize (eager local checkpoint), and register. The
    * replaced entry's blocks are released — a producer re-run (each bench
    * pass) must not accumulate dead checkpoints.
    */
  def put(k: String, df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    val old = cache.put(k, c)
    if (old != null && (old ne c))
      try old.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    c
  }

  /** Latest materialization, or build-and-register when absent. */
  def getOrBuild(k: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(k, _ => build.localCheckpoint())
}
