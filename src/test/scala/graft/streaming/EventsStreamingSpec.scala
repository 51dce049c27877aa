package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** True streaming-execution tests: MemoryStream micro-batches through the
  * watermarked window aggregations and the custom-state sessionizer.
  */
class EventsStreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def mkEvents: Seq[Events.Event] = Seq(
    Events.Event(0, ts(0), 1, "click", 1.0),
    Events.Event(1, ts(1), 1, "click", 2.0),
    Events.Event(2, ts(11), 2, "view", 3.0),
    Events.Event(3, ts(12), 1, "click", 4.0),
    Events.Event(4, ts(25), 2, "view", 5.0)
  )

  test("tumbling window streaming result equals batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Events.Event]
    val streaming = Events.tumblingCounts(mem.toDF(), "10 minutes")
    val q = streaming.writeStream
      .format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      val expected = Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:10:00.0", "view", 1L, 3.0),
        ("2024-01-01 10:10:00.0", "click", 1L, 4.0),
        ("2024-01-01 10:20:00.0", "view", 1L, 5.0))
      assert(got == expected, s"got $got")
    } finally q.stop()
  }

  test("session_window groups by gap per user (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Events.Event]
    val q = Events.sessionWindows(mem.toDF(), "10 minutes").writeStream
      .format("memory").queryName("session_test").outputMode("complete").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      val got = spark.table("session_test")
        .select("user_id", "n_events", "session_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // user 1: events at :00,:01 then :12 (11min gap > 10) → two sessions
      // user 2: :11 and :25 → two sessions
      assert(got == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 3.0), (2L, 1L, 5.0)),
        s"got $got")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Events.Event]
    val sessions = Events.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
    val q = sessions.writeStream
      .format("memory").queryName("fmgws_test").outputMode("append").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      // sessions closed by a later event in the same batch: user 1's
      // :00-:01 session (closed by :12) and user 2's :11 (closed by :25)
      val got = spark.table("fmgws_test")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 2L, 3.0), (2L, 1L, 3.0)), s"got $got")
    } finally q.stop()
  }

  test("sessionizer flushes idle sessions once the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Events.Event]
    val sessions = Events.sessionize(mem.toDS(),
      gapMs = 10 * 60 * 1000L, watermark = "5 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("fmgws_timeout_test").outputMode("append").start()
    try {
      mem.addData(mkEvents: _*)
      q.processAllAvailable()
      // a much later event (different user) advances the watermark far past
      // every open session's gap — the idle sessions must flush via timeout,
      // not wait for more per-user events that never come
      mem.addData(Events.Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Events.Event(100, Timestamp.valueOf("2024-01-01 14:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("fmgws_timeout_test")
        .select("user_id", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // every session from mkEvents is now closed: user 1 {:00,:01} and
      // {:12}, user 2 {:11} and {:25} — plus user 9's flushed first session
      assert(got == Set((1L, 2L, 3.0), (1L, 1L, 4.0),
        (2L, 1L, 3.0), (2L, 1L, 5.0), (9L, 1L, 0.0)), s"got $got")
    } finally q.stop()
  }

  test("variable-gap sessionizer: a high-value event SHRINKS its gap " +
    "(splits where the constant gap would not — q76's streaming half)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 5: value-250 event at :00 → allowed gap after it is
    // max(5, 30-25) = 5 min (Events.valueGapMs); next event at :07 is PAST
    // it → two sessions. A constant 10-min gap would merge them.
    val evs = Seq(
      Events.Event(50, ts(0), 5, "buy", 250.0),
      Events.Event(51, ts(7), 5, "click", 1.0))
    val flush = Seq( // watermark advancers (different user, much later)
      Events.Event(98, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "x", 0.0),
      Events.Event(99, Timestamp.valueOf("2024-01-01 14:00:00"), 9, "x", 0.0))

    val memV = MemoryStream[Events.Event]
    val qv = Events.sessionizeVariableGap(memV.toDS(),
        e => Events.valueGapMs(e.value), watermark = "5 minutes")
      .writeStream.format("memory").queryName("vargap_test")
      .outputMode("append").start()
    val memC = MemoryStream[Events.Event]
    val qc = Events.sessionize(memC.toDS(),
        gapMs = 10 * 60 * 1000L, watermark = "5 minutes")
      .writeStream.format("memory").queryName("constgap_test")
      .outputMode("append").start()
    try {
      Seq(memV, memC).foreach { m =>
        m.addData(evs: _*); m.addData(flush.head); m.addData(flush.last)
      }
      qv.processAllAvailable(); qc.processAllAvailable()
      def sessionsOf(table: String): Set[(Long, Long, Double)] =
        spark.table(table).filter(col("user_id") === 5)
          .select("user_id", "n_events", "total_value")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sessionsOf("vargap_test") == Set((5L, 1L, 250.0), (5L, 1L, 1.0)),
        "value-dependent gap must split at the 7-min gap")
      assert(sessionsOf("constgap_test") == Set((5L, 2L, 251.0)),
        "constant 10-min gap must keep one session — the rules diverge here")
    } finally { qv.stop(); qc.stop() }
  }

  test("dedupStream drops duplicate event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Events.Event]
    val q = Events.dedupStream(mem.toDF()).writeStream
      .format("memory").queryName("dedup_stream_test").outputMode("append").start()
    try {
      mem.addData(mkEvents: _*)
      mem.addData(mkEvents.take(3): _*) // duplicate arrivals
      q.processAllAvailable()
      val got = spark.table("dedup_stream_test")
      assert(got.count() == mkEvents.length, "duplicates not dropped")
      assert(got.select("event_id").distinct().count() == mkEvents.length)
    } finally q.stop()
  }

  test("stream-stream attribution join matches the time-bound semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Events.Event]
    val purchases = MemoryStream[Events.Event]
    val joined = Events.attributionJoin(clicks.toDF(), purchases.toDF(),
      window_ = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream
      .format("memory").queryName("attjoin_test").outputMode("append").start()
    try {
      clicks.addData(
        Events.Event(1, ts(0), 1, "click", 0.0), // 12 min before: outside
        Events.Event(2, ts(5), 1, "click", 0.0), // 7 min before: attributed
        Events.Event(3, ts(10), 1, "click", 0.0), // 2 min before: attributed
        Events.Event(4, ts(5), 2, "click", 0.0)) // other user
      purchases.addData(Events.Event(100, ts(12), 1, "purchase", 9.99))
      q.processAllAvailable()
      val got = spark.table("attjoin_test")
        .select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 2L), (100L, 3L)),
        s"attribution window misapplied: $got")
    } finally q.stop()
  }

  test("left-outer stream-stream join: unattributed purchase emits null " +
    "click once the watermark closes its window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Events.Event]
    val purchases = MemoryStream[Events.Event]
    val joined = Events.attributionJoinOuter(clicks.toDF(), purchases.toDF(),
      window_ = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream
      .format("memory").queryName("attjoin_outer_test")
      .outputMode("append").start()
    try {
      clicks.addData(Events.Event(2, ts(5), 1, "click", 0.0))
      purchases.addData(
        Events.Event(100, ts(12), 1, "purchase", 9.99), // attributed
        Events.Event(101, ts(12), 2, "purchase", 5.0)) // no click: outer
      q.processAllAvailable()
      // outer row for 101 cannot emit yet — a matching click could still
      // arrive until the CLICK watermark passes its window
      val early = spark.table("attjoin_outer_test")
        .filter(col("purchase_id") === 101).count()
      assert(early == 0, "outer row emitted before the watermark closed")
      // advance BOTH watermarks far past purchase 101's join window
      clicks.addData(Events.Event(900, ts(120), 9, "click", 0.0))
      purchases.addData(Events.Event(901, ts(120), 9, "purchase", 1.0))
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch flushes outer state
      val got = spark.table("attjoin_outer_test")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(got.contains((100L, Some(2L))), s"attributed row missing: $got")
      assert(got.contains((101L, None)),
        s"unattributed purchase never emitted with null click: $got")
    } finally q.stop()
  }

  test("goldStream: checkpointed parquet sink with restart recovery") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("goldstream")
    val (src, out, ckpt) =
      (s"$base/src", s"$base/out", s"$base/ckpt")
    new java.io.File(src).mkdirs()

    def writeBatch(name: String, events: Seq[Events.Event]): Unit =
      events.toDF().write.parquet(s"$src/$name")

    // batch 1: two closed-able windows plus a live one
    writeBatch("b1", (0 until 30).map(i =>
      Events.Event(i, ts(i * 2 % 60), i % 3, "click", 1.0)))
    val stream1 = spark.readStream.schema(
      implicitly[org.apache.spark.sql.Encoder[Events.Event]].schema)
      .parquet(s"$src/*")
    Events.goldStream(stream1, out, ckpt).awaitTermination()
    val n1 = spark.read.parquet(out).count()

    // batch 2: later events advance the watermark, closing earlier windows
    writeBatch("b2", (100 until 130).map(i =>
      Events.Event(i, Timestamp.valueOf("2024-01-01 13:00:00"), i % 3, "view", 2.0)))
    val stream2 = spark.readStream.schema(
      implicitly[org.apache.spark.sql.Encoder[Events.Event]].schema)
      .parquet(s"$src/*")
    Events.goldStream(stream2, out, ckpt).awaitTermination()
    val result = spark.read.parquet(out)
    val n2 = result.count()

    assert(n2 > n1, s"restart produced no new windows ($n1 -> $n2)")
    // exactly-once: no duplicate (window, event_type) rows across restarts
    assert(result.groupBy("window_start", "event_type")
      .count().filter(col("count") > 1).count() == 0)
  }

  test("file-stream source over events parquet dir runs windowed agg") {
    val sf = sfDir("0.001")
    // static twin on the same data for comparison
    val static = graft.queries.Q.t(spark, sf, "events")
    val expected = static.groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events")).count()
    import org.apache.spark.sql.types._
    // nanos fixture: the file-STREAM source hands TIMESTAMP(NANOS) to a
    // LongType schema as MICROS (unlike the batch nanosAsLong path, which
    // yields raw nanos) — so convert with timestamp_micros directly, no
    // DIV 1000. Verified empirically: DIV 1000 lands all events in 1970.
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    // file-stream sources need a directory: stage the fixture into one
    val streamDir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(col("ts")))
    val q = Events.tumblingCounts(stream, "10 minutes").writeStream
      .format("memory").queryName("file_stream_test").outputMode("append").start()
    try {
      // batch 1: with a single file the watermark only advances AFTER the
      // batch, so append mode emits nothing yet — that's correct semantics.
      q.processAllAvailable()
      // Stage a second file with one sentinel event 2h past the fixture's
      // max so the next micro-batch's watermark (max - 30min delay) closes
      // every real window deterministically.
      val maxLdt = spark.read.parquet(s"$sf/events.parquet")
        .agg(max(col("ts"))).head.getAs[java.time.LocalDateTime](0)
      val maxMicros =
        maxLdt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + maxLdt.getNano / 1000L
      val sentinelDir = java.nio.file.Files.createTempDirectory("events_sentinel")
      val sentinel = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          999999L, maxMicros + 7200L * 1000000L, 0L, "sentinel", 0.0, "{}")),
        schema)
      sentinel.coalesce(1).write.mode("overwrite").parquet(sentinelDir.toString)
      val part = java.nio.file.Files.list(sentinelDir).iterator.asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, streamDir.resolve("sentinel.parquet"))
      q.processAllAvailable()
      // all real windows closed; the sentinel's own window stays open
      // (its end > watermark), so the count is exactly the static count
      val n = spark.table("file_stream_test").count()
      assert(n == expected, s"file-stream windows $n vs static $expected")
    } finally q.stop()
  }
}
