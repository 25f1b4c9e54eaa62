package graft

import graft.streaming.EventStreams
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Streaming behavior: each streaming transform must equal its batch twin
  * when driven to completion over a static file set (the Structured
  * Streaming contract), exercised via the memory sink.
  */
class StreamingSpec extends SparkSpec {

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling counts == batch twin") {
    // FileStreamSource wants a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir.toString)
    runToMemory(EventStreams.tumblingCounts(stream), "tumbling_out", "append")
    val streamed = spark.table("tumbling_out")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.tumblingCounts(Tables.events(spark, sf0001))
      .collect().map(_.toSeq).toSet
    // watermark may hold back the tail windows in append mode; everything
    // emitted must match the batch result and cover most of it
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streamed rows not in batch: ${(streamed -- batch).take(3)}")
    assert(streamed.size >= batch.size / 2)
  }

  test("readEventStream starts against an empty directory (legacy-layout fallback)") {
    // producers often start AFTER the stream in a deployed pipeline: an
    // unpopulated directory can't be schema-probed, so startup falls back
    // to the legacy LongType layout instead of throwing
    val dir = java.nio.file.Files.createTempDirectory("events_empty")
    val stream = EventStreams.readEventStream(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // an explicit hint pins the layout without any probe
    val hinted = EventStreams.readEventStream(spark, dir.toString,
      tsTypeHint = Some(org.apache.spark.sql.types.LongType))
    assert(hinted.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
  }

  test("RocksDB state store: stateful agg matches batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("events_rocksdb")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    EventStreams.useRocksDbStateStore(spark)
    try {
      val stream = EventStreams.readEventStream(spark, dir.toString)
      runToMemory(EventStreams.tumblingCounts(stream), "tumbling_rocksdb", "append")
      val streamed = spark.table("tumbling_rocksdb")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.tumblingCounts(Tables.events(spark, sf0001))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed.subsetOf(batch))
    } finally EventStreams.useRocksDbStateStore(spark, enable = false)
  }

  test("streaming dedup within watermark drops replayed event_ids") {
    // stage the same file twice: the second micro-batch replays every event
    val dir = java.nio.file.Files.createTempDirectory("events_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("b.parquet"))
    val total = Tables.events(spark, sf0001).count()
    val stream = EventStreams.readEventStream(spark, dir.toString)
    runToMemory(EventStreams.dedupWithinWatermark(stream), "dedup_out", "append")
    val n = spark.table("dedup_out").count()
    assert(n == total, s"expected $total deduped events, got $n")
  }

  test("session windows produce non-overlapping per-user sessions") {
    val out = EventStreams.sessionCounts(Tables.events(spark, sf0001).where(col("user_id") < 5))
    val rows = out.orderBy(col("user_id"), col("session_start")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, sessions) =>
      sessions.sliding(2).foreach {
        case Array(a, b) =>
          assert(!b.getAs[java.sql.Timestamp]("session_start").before(a.getAs[java.sql.Timestamp]("session_end")))
        case _ =>
      }
    }
  }

  test("stream-stream join == batch twin within the time bound") {
    val dir = java.nio.file.Files.createTempDirectory("events_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir.toString)
    runToMemory(EventStreams.clickToPurchaseJoin(stream), "ssj_out", "append")
    val streamed = spark.table("ssj_out").select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStreams.clickToPurchaseJoin(Tables.events(spark, sf0001))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size / 2) // watermark may hold back the tail
  }

  test("foreachBatch sink receives every micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("events_feb")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"), dir.resolve("b.parquet"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val stream = EventStreams.readEventStream(spark, dir.toString)
    val q = EventStreams.writeForeachBatch(stream, (batch, id) => { seen.add((id, batch.count())); () }).start()
    q.processAllAvailable(); q.stop()
    val batches = seen.toArray(Array.empty[(Long, Long)])
    assert(batches.length == 2) // maxFilesPerTrigger=1 → one batch per file
    assert(batches.map(_._2).sum == 2 * Tables.events(spark, sf0001).count())
  }

  test("file-sink restart from checkpoint is exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("fsink_out").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("fsink_ckpt").toString
    val source = MemoryStream[(Long, String)]
    def start() = source.toDF.toDF("id", "v").writeStream
      .format("parquet").option("path", outDir).option("checkpointLocation", ckpt).start()
    val q1 = start()
    source.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable(); q1.stop()
    // restart against the same checkpoint; new data only must be appended
    val q2 = start()
    source.addData((3L, "c"))
    q2.processAllAvailable(); q2.stop()
    val rows = spark.read.parquet(outDir).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")), s"got $rows")
  }

  test("flatMapGroupsWithState sessions: gap close + event-time timeout close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def ts(minutes: Long) = new java.sql.Timestamp(t0 + minutes * 60000L)
    val source = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = EventStreams.sessionsWithState(
      source.toDF.toDF("user_id", "ts", "value"), gap = "30 minutes", watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode("append").start()
    // session A: two events 10 min apart
    source.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0))
    q.processAllAvailable()
    // event 3h later: beyond gap → closes session A in-line, opens B
    source.addData((1L, ts(180), 5.0))
    q.processAllAvailable()
    // other user far in the future: advances the watermark past B's
    // end+gap → B closes via event-time timeout on a following trigger
    source.addData((2L, ts(600), 0.0))
    q.processAllAvailable()
    source.addData((2L, ts(601), 0.0)) // one more trigger to fire the timeout
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fmgws_sessions")
      .as[EventStreams.ClosedSession].collect().filter(_.userId == 1L)
      .sortBy(_.sessionStart.getTime)
    assert(out.length == 2, s"got ${out.toSeq}")
    assert(out(0).nEvents == 2 && out(0).sumValue == 3.0)
    assert(out(0).sessionStart == ts(0) && out(0).sessionEnd == ts(10))
    assert(out(1).nEvents == 1 && out(1).sumValue == 5.0)
  }

  test("flatMapGroupsWithState sessions: out-of-order event far in the past does NOT merge (review r2)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00").getTime
    def ts(minutes: Long) = new java.sql.Timestamp(t0 + minutes * 60000L)
    val source = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = EventStreams.sessionsWithState(
      source.toDF.toDF("user_id", "ts", "value"), gap = "30 minutes", watermark = "12 hours")
    val q = sessions.writeStream.format("memory").queryName("fmgws_ooo")
      .outputMode("append").start()
    source.addData((1L, ts(300), 1.0)) // session at 15:00
    q.processAllAvailable()
    // out-of-order event hours EARLIER, still inside the 12h watermark:
    // used to merge into the 15:00 session (signed-gap bug); must become
    // its own open interval, sealed by the watermark like any other
    source.addData((1L, ts(0), 7.0))
    q.processAllAvailable()
    // advance the watermark far past both intervals, then one more
    // trigger to fire the timers
    source.addData((2L, ts(3000), 0.0))
    q.processAllAvailable()
    source.addData((2L, ts(3001), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("fmgws_ooo").as[EventStreams.ClosedSession].collect()
      .filter(_.userId == 1L).sortBy(_.sessionStart.getTime)
    assert(out.length == 2, s"got ${out.toSeq}")
    assert(out(0).sessionStart == ts(0) && out(0).nEvents == 1 && out(0).sumValue == 7.0)
    assert(out(1).sessionStart == ts(300) && out(1).nEvents == 1 && out(1).sumValue == 1.0)
  }

  test("sessionsWithState equals the session_window batch twin on real events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf0001).where(col("user_id") < 20)
      .select($"user_id", $"ts", $"value")
      .as[(Long, java.sql.Timestamp, Double)].collect().sortBy(_._2.getTime)
    val source = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = EventStreams.sessionsWithState(
      source.toDF.toDF("user_id", "ts", "value"), gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("fmgws_equiv").outputMode("append").start()
    // two real batches, then dummy far-future events to seal everything
    val (b1, b2) = events.splitAt(events.length / 2)
    source.addData(b1.toSeq); q.processAllAvailable()
    source.addData(b2.toSeq); q.processAllAvailable()
    val sealAt = new java.sql.Timestamp(events.last._2.getTime + 30L * 24 * 3600 * 1000)
    source.addData((9999L, sealAt, 0.0)); q.processAllAvailable()
    source.addData((9999L, sealAt, 0.0)); q.processAllAvailable()
    q.stop()
    val got = spark.table("fmgws_equiv").as[EventStreams.ClosedSession].collect()
      .filter(_.userId < 20)
      .map(s => (s.userId, s.sessionStart.getTime, s.nEvents, math.round(s.sumValue * 1e6)))
      .toSet
    // batch twin: built-in session_window over the same events
    val twin = Tables.events(spark, sf0001).where(col("user_id") < 20)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("session_window.start"), col("user_id"), col("n"), col("v"))
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(0).getTime, r.getLong(2), math.round(r.getDouble(3) * 1e6)))
      .toSet
    assert(got == twin, s"missing=${twin -- got} extra=${got -- twin}")
  }

  test("transformWithState running totals accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    EventStreams.useRocksDbStateStore(spark) // TWS streams require RocksDB
    try {
      val source = MemoryStream[(Long, Double)]
      val totals = EventStreams.runningUserTotalsTws(source.toDF.toDF("user_id", "value"))
      val q = totals.writeStream.format("memory").queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", java.nio.file.Files.createTempDirectory("tws_ckpt").toString)
        .start()
      source.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      source.addData((1L, 5.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("tws_totals").as[EventStreams.UserRunning].collect()
        .groupBy(_.userId).map { case (k, rows) => k -> rows.maxBy(_.nEvents) }
      assert(last(1L).nEvents == 3 && last(1L).totalValue == 10.0)
      assert(last(2L).nEvents == 1 && last(2L).totalValue == 10.0)
    } finally EventStreams.useRocksDbStateStore(spark, enable = false)
  }

  test("stateful running totals via mapGroupsWithState (batch mode)") {
    val events = Tables.events(spark, sf0001).where(col("user_id") < 3)
    val out = EventStreams.runningUserTotals(events).collect()
    val exp = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out.foreach { u =>
      val (n, v) = exp(u.userId)
      assert(u.nEvents == n)
      assert(math.abs(u.totalValue - v) < 1e-6)
    }
  }
}
