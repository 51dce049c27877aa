package graft.streaming

import graft.SparkSpec
import graft.ext.Sketches
import graft.queries.Q
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KMV ingest: the persisted sketch after N micro-batches must
  * equal the batch sketch over the union of all batches (stream≡batch),
  * and replaying a batch must not change it (merge idempotence).
  */
class SketchStreamSpec extends SparkSpec {

  test("stream of batches converges to the batch KMV census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sketch_stream")
    val (skP, ckpt) = (s"$base/sketch", s"$base/ckpt")

    val orders = Q.t(spark, sfDir("0.01"), "orders")
      .select(col("o_orderpriority").as("shard"),
        col("o_custkey").as("key"))
    val half1 = orders.filter(col("key") % 2 === 0)
      .as[(String, Long)].collect().toSeq
    val half2 = orders.filter(col("key") % 2 =!= 0)
      .as[(String, Long)].collect().toSeq

    val mem = MemoryStream[(String, Long)]
    val q = SketchStream.start(
      mem.toDF().toDF("shard", "key"), "shard", "key", skP, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      mem.addData(half1: _*)
      q.processAllAvailable()
      mem.addData(half2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = SketchStream.estimates(spark, skP)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = Sketches.kmvCensus(orders, "shard", "key")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming CMS: batches accumulate, replay guard blocks double-count") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cms_stream")
    val gridDir = s"$base/grid"
    val b1 = Seq((1L, "apple apple banana")).toDF("doc_id", "text")
    val b2 = Seq((2L, "apple cherry")).toDF("doc_id", "text")
    SketchStream.processCountMinBatch(b1, 0L, "text", gridDir, 1 << 12, 3)
    SketchStream.processCountMinBatch(b2, 1L, "text", gridDir, 1 << 12, 3)
    def est(t: String) =
      SketchStream.countMinEstimate(spark, gridDir, t, 1 << 12, 3)
    assert(est("apple") == 3L && est("banana") == 1L && est("cherry") == 1L)
    assert(est("absent") == 0L)
    // replayed epoch 1 must be skipped — addition is not idempotent
    SketchStream.processCountMinBatch(b2, 1L, "text", gridDir, 1 << 12, 3)
    assert(est("apple") == 3L, "replay double-counted")
  }

  test("streaming histogram: stream grid == batch grid; replay guarded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("hist_stream")
    val (gridDir, ckpt) = (s"$base/grid", s"$base/ckpt")
    val ev = Q.t(spark, sfDir("0.01"), "events").select(col("value"))
    val half1 = ev.filter(col("value") < 30.0).as[Double].collect().toSeq
    val half2 = ev.filter(col("value") >= 30.0).as[Double].collect().toSeq

    val mem = MemoryStream[Double]
    val q = SketchStream.startHistogram(
      mem.toDF().toDF("value"), "value", gridDir, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      mem.addData(half1: _*)
      q.processAllAvailable()
      mem.addData(half2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // the persisted grid after two micro-batches == the batch grid
    val streamed = spark.read
      .parquet(s"$gridDir/${CdcIngest.latestVersion(gridDir).get}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Sketches.histGrid(ev, "value", 8.0, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    // quantile readout agrees with the batch incremental census
    val (n, p50, p90) = SketchStream.histQuantiles(spark, gridDir)
    val row = Sketches.histQuantileIncremental(
      ev.filter(col("value") < 30.0), ev.filter(col("value") >= 30.0),
      "value").head()
    assert(n == row.getLong(0) && p50 == row.getDouble(1) &&
      p90 == row.getDouble(3))
    // replayed epoch must be skipped — addition is not idempotent
    val before = SketchStream.histQuantiles(spark, gridDir)
    SketchStream.processHistogramBatch(
      half2.toDF("value"), 1L, "value", gridDir, 8.0, 64)
    assert(SketchStream.histQuantiles(spark, gridDir) == before)
  }

  test("replaying a batch is a no-op (merge idempotence, no epoch guard)") {
    val base = java.nio.file.Files.createTempDirectory("sketch_replay")
    val skP = s"$base/sketch"
    val orders = Q.t(spark, sfDir("0.01"), "orders")
      .select(col("o_orderpriority").as("shard"), col("o_custkey").as("key"))
    SketchStream.processBatch(orders, "shard", "key", skP, k = 64)
    val once = spark.read.parquet(skP)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    SketchStream.processBatch(orders, "shard", "key", skP, k = 64) // replay
    val twice = spark.read.parquet(skP)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(once == twice)
  }
}
