package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-level byte accounting for a window of queries (VERDICT r9 #1):
  * wall-time on one box cannot distinguish "scales" from "fits in page
  * cache", so the 100-TB claims (long-only shuffles, base-never-moves,
  * one-shuffle-per-step) need BYTE evidence per swept query, not prose.
  *
  * A [[SparkListener]] accumulating every finished task's metrics between
  * [[reset]] and [[snapshot]]. Queries run sequentially in the sweep, so
  * the window is exactly one query; the listener bus is async, so
  * [[snapshot]] waits for the task stream to quiesce (no new task-end for
  * two consecutive beats, bounded) before reading.
  *
  * Captured per window:
  *  - shuffle WRITE bytes (what the query pushed into exchanges — the
  *    scale-claim currency: a "long-only shuffle" op must stay near
  *    bytes-per-input-row of its key width)
  *  - shuffle READ bytes (what downstream stages pulled back)
  *  - disk + memory spill bytes (a nonzero disk spill at the sweep point
  *    means the partition sizing story fails at 1000× executors too)
  *  - input bytes / records read at the source (the ratio denominator)
  */
final class TaskMetricsLedger extends SparkListener {

  private val shuffleWrite = new AtomicLong(0)
  private val shuffleRead = new AtomicLong(0)
  private val diskSpill = new AtomicLong(0)
  private val memSpill = new AtomicLong(0)
  private val inputBytes = new AtomicLong(0)
  private val inputRecords = new AtomicLong(0)
  private val tasks = new AtomicLong(0)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      diskSpill.addAndGet(m.diskBytesSpilled)
      memSpill.addAndGet(m.memoryBytesSpilled)
      inputBytes.addAndGet(m.inputMetrics.bytesRead)
      inputRecords.addAndGet(m.inputMetrics.recordsRead)
      tasks.incrementAndGet()
      ()
    }
  }

  def reset(): Unit = {
    drain()
    Seq(shuffleWrite, shuffleRead, diskSpill, memSpill, inputBytes,
      inputRecords, tasks).foreach(_.set(0))
  }

  /** Wait until no task-end event has landed for two consecutive 100 ms
    * beats (bounded at ~10 s) — the async bus has then delivered
    * everything the just-finished query produced.
    */
  private def drain(): Unit = {
    var prev = -1L
    var stable = 0
    var spins = 0
    while (spins < 100 && stable < 2) {
      val cur = tasks.get
      if (cur == prev) stable += 1 else stable = 0
      prev = cur
      Thread.sleep(100)
      spins += 1
    }
  }

  def snapshot(): TaskMetricsLedger.Snapshot = {
    drain()
    TaskMetricsLedger.Snapshot(
      shuffleWriteBytes = shuffleWrite.get,
      shuffleReadBytes = shuffleRead.get,
      diskSpillBytes = diskSpill.get,
      memSpillBytes = memSpill.get,
      inputBytes = inputBytes.get,
      inputRecords = inputRecords.get,
      tasks = tasks.get)
  }
}

object TaskMetricsLedger {

  final case class Snapshot(
      shuffleWriteBytes: Long,
      shuffleReadBytes: Long,
      diskSpillBytes: Long,
      memSpillBytes: Long,
      inputBytes: Long,
      inputRecords: Long,
      tasks: Long) {

    /** The budget currency: shuffle-write bytes per source record read. */
    def writeBytesPerRecord: Double =
      shuffleWriteBytes.toDouble / math.max(inputRecords, 1L).toDouble

    def json: String = {
      def gb(b: Long): String = f"${b / 1e9}%.3f"
      s"""{"shuffle_write_gb": ${gb(shuffleWriteBytes)}, """ +
        s""""shuffle_read_gb": ${gb(shuffleReadBytes)}, """ +
        s""""disk_spill_gb": ${gb(diskSpillBytes)}, """ +
        s""""mem_spill_gb": ${gb(memSpillBytes)}, """ +
        s""""input_gb": ${gb(inputBytes)}, """ +
        s""""input_rows": $inputRecords, """ +
        s""""write_bytes_per_row": ${f"$writeBytesPerRecord%.2f"}}"""
    }
  }

  /** Register on a session's SparkContext; caller keeps the handle for
    * reset/snapshot and removes it when done.
    */
  def install(spark: SparkSession): TaskMetricsLedger = {
    val l = new TaskMetricsLedger
    spark.sparkContext.addSparkListener(l)
    l
  }

  def uninstall(spark: SparkSession, l: TaskMetricsLedger): Unit =
    spark.sparkContext.removeSparkListener(l)
}
