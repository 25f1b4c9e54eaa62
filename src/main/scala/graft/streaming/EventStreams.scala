package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming coverage for the `events` table — pure new
  * capability relative to the reference (which has only pipelined
  * incremental writes, no query-level streaming — SURVEY.md §2.7;
  * reference org.knime.core.columnar/.../badger/HeapBadger.java:80-86).
  *
  * All transforms here work identically on a batch DataFrame and a
  * streaming one (the contract Structured Streaming is built on), so the
  * batch twins are what the correctness oracle checks; tests drive the
  * streaming path through a memory sink with `processAllAvailable`.
  *
  * Scale notes: stateful operators shard state by key across executors;
  * watermarks bound state size; at 100 TB/day ingest the knobs that matter
  * are watermark delay (state retention), shuffle partitions (state
  * shards), and the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
object EventStreams {

  /** On-disk schema across driver generations: ts has shipped as
    * TIMESTAMP(NANOS) (readable only as Long via
    * legacy.parquet.nanosAsLong) and as TIMESTAMP(MICROS) without UTC
    * adjustment (reads as TIMESTAMP_NTZ). `tsType` selects the variant;
    * both are converted to session-local micros on ingest.
    */
  def eventSchemaRaw(tsType: org.apache.spark.sql.types.DataType = LongType): StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)
    ))

  /** Switch stateful streaming queries to the RocksDB state store — the
    * setting that matters once per-shard state outgrows executor heap
    * (large watermark windows, high-cardinality keys at 100 TB/day):
    * state lives off-heap in RocksDB with incremental checkpointing,
    * instead of the default in-memory HDFS-backed map. Takes effect for
    * queries STARTED after the call; pass `enable = false` to restore the
    * default provider.
    */
  def useRocksDbStateStore(spark: SparkSession, enable: Boolean = true): Unit =
    if (enable)
      spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

  /** Open the events parquet directory as a stream (one-file-per-trigger
    * keeps local tests deterministic).
    */
  def readEventStream(spark: SparkSession, path: String, tsTypeHint: Option[org.apache.spark.sql.types.DataType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a stream needs a declared schema; probe the existing files once
    // (batch footer read) to pick the generation's ts layout. An empty or
    // not-yet-populated directory (producers haven't written — the normal
    // stream-starts-first deployment) can't be probed: fall back to the
    // legacy LongType layout rather than failing stream startup, or let
    // the caller pin the layout via `tsTypeHint`.
    val tsType = tsTypeHint.getOrElse {
      try spark.read.parquet(path).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => LongType }
    }
    val raw = spark.readStream
      .schema(eventSchemaRaw(tsType))
      .option("maxFilesPerTrigger", 1)
      .parquet(path)
    tsType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling-window aggregation with watermark (works batch & stream). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value")
      )

  /** Sliding-window aggregation. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Session windows (gap-based) per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"),
        col("n_events"),
        col("sum_value")
      )

  /** Streaming dedup on event_id bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream self-join: clicks joined to purchases of the same user
    * within [0, maxGap] AFTER the click — both sides watermarked, the time
    * bound lets the state store evict (unbounded stream-stream joins are
    * rejected by Spark in append mode).
    */
  def clickToPurchaseJoin(events: DataFrame, watermark: String = "1 hour", maxGap: String = "30 minutes"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    clicks.join(
      purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxGap"),
      "inner"
    ).select(col("click_id"), col("purchase_id"), col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  /** foreachBatch sink: per-micro-batch handler with the batch id — the
    * escape hatch for idempotent upserts into arbitrary stores.
    */
  def writeForeachBatch(df: DataFrame, handler: (DataFrame, Long) => Unit) =
    df.writeStream.outputMode("append").foreachBatch(handler)

  final case class SessionAcc(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class ClosedSession(
      userId: Long,
      sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp,
      nEvents: Long,
      sumValue: Double)

  final case class SessionSet(sessions: Seq[SessionAcc])

  /** Custom-state sessionization via flatMapGroupsWithState with
    * EVENT-TIME timeouts — the fully-controlled twin of
    * [[sessionCounts]]'s built-in `session_window`, for session logic the
    * built-in can't express (per-session aggregates beyond counts,
    * session-end side effects, dynamic gaps).
    *
    * Semantics: a session CLOSES only when the WATERMARK passes its
    * end + gap — a later event alone proves nothing, because an
    * out-of-order event inside the watermark could still arrive and
    * bridge or extend any open interval. State per key is therefore a
    * SET of open session intervals: each event merges every interval it
    * is within `gap` of (possibly bridging several into one), or opens a
    * new interval; the event-time timer fires at the earliest
    * `end + gap`, emitting exactly the intervals the watermark has
    * sealed. Output equals `session_window` run over the same (in-
    * watermark) events.
    */
  def sessionsWithState(events: DataFrame, gap: String = "30 minutes", watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapIv.months == 0, s"sessionsWithState: month/year gaps are not fixed durations: '$gap'")
    val gapMillis = gapIv.days * 86400000L + gapIv.microseconds / 1000L
    require(gapMillis > 0, s"sessionsWithState: gap must be positive: '$gap'")

    def close(user: Long, s: SessionAcc) = ClosedSession(
      user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs), s.n, s.sum)

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)], state: GroupState[SessionSet]) =>
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val (sealed_, open) = state.get.sessions.partition(_.endMs + gapMillis <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(SessionSet(open))
              state.setTimeoutTimestamp(open.map(_.endMs + gapMillis).min)
            }
            sealed_.sortBy(_.startMs).map(close(user, _)).iterator
          } else {
            var sessions = state.getOption.map(_.sessions).getOrElse(Seq.empty)
            rows.foreach { case (_, ts, value) =>
              val t = ts.getTime
              val (touching, rest) = sessions.partition(s =>
                t >= s.startMs - gapMillis && t <= s.endMs + gapMillis)
              val merged = touching.foldLeft(SessionAcc(t, t, 1L, value)) { (a, s) =>
                SessionAcc(
                  math.min(a.startMs, s.startMs), math.max(a.endMs, s.endMs),
                  a.n + s.n, a.sum + s.sum)
              }
              sessions = rest :+ merged
            }
            // Seal already-expired intervals HERE too: when new data for
            // this key arrives in the same batch that should have timed it
            // out, the data path runs instead of the timeout path, and a
            // stale interval's end + gap is <= the current watermark —
            // setTimeoutTimestamp would throw (timers must be strictly
            // beyond the watermark) and kill the query. ADVICE r2.
            val wm = state.getCurrentWatermarkMs()
            val (sealed_, open) = sessions.partition(_.endMs + gapMillis <= wm)
            if (open.nonEmpty) {
              state.update(SessionSet(open))
              state.setTimeoutTimestamp(open.map(_.endMs + gapMillis).min)
            } else if (state.exists) state.remove()
            sealed_.sortBy(_.startMs).map(close(user, _)).iterator
          }
      }
  }

  final case class UserRunning(userId: Long, nEvents: Long, totalValue: Double)

  /** [[runningUserTotals]] on the transformWithState API (Spark 4's
    * successor to mapGroupsWithState: typed per-key state handles with
    * TTL, timers, and multiple state variables per processor). Requires
    * the RocksDB state store provider when run as a STREAM
    * ([[useRocksDbStateStore]]); works in batch mode on any provider.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserRunning] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserRunning](
        "totals",
        org.apache.spark.sql.Encoders.product[UserRunning],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[(Long, Double)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      val prev = if (totals.exists()) totals.get() else UserRunning(user, 0L, 0.0)
      val (n, v) = rows.foldLeft((prev.nEvents, prev.totalValue)) { case ((cn, cv), (_, value)) =>
        (cn + 1, cv + value)
      }
      val next = UserRunning(user, n, v)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Drive [[RunningTotalsProcessor]] over an events frame (batch or
    * stream — same code, the Structured Streaming contract).
    */
  def runningUserTotalsTws(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(
        new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Custom state: running per-user totals via mapGroupsWithState — the
    * KeyValueGroupedDataset stateful escape hatch (analog of the
    * reference's per-row mapper surface, lifted to streams).
    */
  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          val (n, v) = rows.foldLeft((prev.nEvents, prev.totalValue)) { case ((cn, cv), (_, value)) =>
            (cn + 1, cv + value)
          }
          val next = UserRunning(user, n, v)
          state.update(next)
          next
      }
  }
}
