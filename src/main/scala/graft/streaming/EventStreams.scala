package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues}

/** Structured-Streaming surface of the engine (SURVEY §2.3). The reference
  * has no streaming; the harness compares static parquet, so these transforms
  * are exercised by scalatest (MemoryStream) against their batch twins in
  * graft.queries.TimeSeries.
  *
  * Each transform takes the raw events DataFrame (streaming or batch —
  * identical code path, which is the point of the unified Dataset API) and
  * declares watermarks so state is bounded: at 100 TB/day the windowed
  * aggregations keep only the open windows per key in the state store.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** 1-hour tumbling counts per event_type — stream twin of q_ts_tumbling. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(22,6)")).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap session windows per user — stream twin of
    * q_ts_sessionize_batch. session_window merges end-touching sessions: an
    * event exactly `gap` after the previous one stays in the SAME session
    * (merge on gap <= 30 min, split on gap > 30 min), which is exactly the
    * batch twin's strict-gap rule. Pinned empirically at the 30:00 boundary
    * in EventStreamsSuite. */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** Stream-stream interval join: view -> purchase conversion pairs by the
    * same user within (v.ts, v.ts + 5 min] — the streaming twin of the
    * q_join_range_theta SHAPE (the batch query uses a 30-min window; the
    * suite's batch-equality check pins this 5-min horizon on both forms).
    * Both sides carry watermarks AND the join condition
    * bounds event time on both sides, so each side's state store evicts
    * rows once the other side's watermark passes v.ts + 5 min (unbounded
    * state otherwise — Spark rejects append-mode stream-stream joins
    * without such a constraint). */
  def conversionPairs(views: DataFrame, purchases: DataFrame,
                      watermark: String = "10 minutes"): DataFrame =
    conversionJoin(views, purchases, watermark, "inner")

  /** Left-outer variant of [[conversionPairs]]: views with no purchase in
    * their 5-minute horizon are emitted with a null purchase_id once the
    * purchase-side watermark proves none can arrive — the streaming
    * "abandoned view" feed. Same bounded state as the inner form. */
  def conversionPairsOuter(views: DataFrame, purchases: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    conversionJoin(views, purchases, watermark, "left_outer")

  /** Shared core of the inner/outer conversion joins — one place owns the
    * watermarks and the state-bounding time-range condition. */
  private def conversionJoin(views: DataFrame, purchases: DataFrame,
                             watermark: String, joinType: String): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
      .withWatermark("vts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
      .withWatermark("pts", watermark)
    v.join(p, col("user_id") === col("p_user") &&
        col("pts") > col("vts") &&
        col("pts") <= col("vts") + expr("INTERVAL 5 MINUTES"),
        joinType)
      .select(col("view_id"), col("purchase_id"))
  }

  /** Exactly-once-per-id dedup bounded by the watermark. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Running per-user counter on the 4.x transformWithState API: typed
    * state variables via the processor handle (TTL-able, multiple state
    * vars per key — the successor to flatMapGroupsWithState). */
  class RunningCountProcessor extends StatefulProcessor[Long, Event, (Long, Long)] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[(Long, Long)] = {
      val next = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(next)
      Iterator.single((user, next))
    }
  }

  def runningUserCountsTWS(events: Dataset[Event]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Timer-driven sessionization on transformWithState: per user, count
    * events and (re-)arm an event-time timer at last_seen + 30 min; when the
    * watermark passes it, handleExpiredTimer emits (user, n_events,
    * session_end_ms) and clears state — the push-based session close that
    * session_window cannot express (it only emits on the NEXT aggregation
    * trigger). State per key is two longs + one timer: bounded regardless
    * of stream length. */
  class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, (Long, Long, Long)] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var lastSeen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      // The timer only fires once the WATERMARK passes expiry; a prompt
      // event can arrive with event-time gap > gapMs while the watermark
      // still lags. Close expired sessions inline on the input path too —
      // otherwise two sessions separated by hours would merge whenever the
      // later event beats the watermark (EventStreamsSuite pins this).
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var n = if (count.exists()) count.get() else 0L
      var last = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      if (lastSeen.exists()) getHandle.deleteTimer(last + gapMs)
      rows.toArray.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        if (last != Long.MinValue && t - last > gapMs && n > 0) {
          out += ((user, n, last + gapMs))
          n = 0
        }
        n += 1
        last = math.max(last, t)
      }
      count.update(n)
      lastSeen.update(last)
      getHandle.registerTimer(last + gapMs)
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      val out = (user, count.get(), expiredTimerInfo.getExpiryTimeInMs())
      count.clear(); lastSeen.clear()
      Iterator.single(out)
    }
  }

  def sessionTimeouts(events: Dataset[Event],
                      gapMs: Long = 30L * 60 * 1000,
                      watermark: String = "0 seconds"): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Last-touch attribution state machine — streaming twin of the batch
    * q_ts_attribution: per user, remember the most recent touch
    * (click/view/signup); each purchase emits (channel, user) crediting
    * that touch, 'direct' when none precedes it. State per key is ONE
    * string, so a billion-user stream holds a billion short values — the
    * same bound a running counter has (production would add a TTL).
    * Within a micro-batch rows arrive unordered, so the batch's rows are
    * sorted by (ts, event_id) before replay; across batches arrival order
    * is the stream's order, as with every update-mode state machine here. */
  class AttributionProcessor extends StatefulProcessor[Long, Event, (String, Long)] {
    @transient private var lastTouch: org.apache.spark.sql.streaming.ValueState[String] = _
    private val touches = Set("click", "view", "signup")

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastTouch = getHandle.getValueState[String]("lastTouch", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[(String, Long)] = {
      // full timestamp precision: getTime truncates to millis, which would
      // diverge from the batch twin's microsecond (ts, event_id) order for
      // same-millisecond pairs; getNanos carries the sub-second exactly
      val ordered = rows.toSeq.sortBy(e => (e.ts.getTime / 1000, e.ts.getNanos, e.event_id))
      val out = Seq.newBuilder[(String, Long)]
      ordered.foreach { e =>
        if (e.event_type == "purchase")
          out += ((if (lastTouch.exists()) lastTouch.get() else "direct", user))
        if (touches(e.event_type)) lastTouch.update(e.event_type)
      }
      out.result().iterator
    }
  }

  def attributionTWS(events: Dataset[Event]): Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** CDC snapshot maintenance — the sink-side half of streaming: a
    * foreachBatch upsert that folds each micro-batch into a per-user
    * latest-event snapshot (the streaming twin of the batch q_merge_upsert
    * move, without a transactional table format). The winner per user is
    * the max (ts, event_id) event GLOBALLY, not per arrival order, so the
    * final snapshot is the batch argmax over all events — batch-split
    * invariant, which the suite pins by replaying two different splits.
    *
    * Storage is versioned directories `v<batchId>`: each batch reads the
    * latest version STRICTLY BELOW its own id and overwrites its own, so a
    * failed-and-retried batch re-derives the identical snapshot instead of
    * double-applying (idempotent exactly-once on top of at-least-once
    * delivery). At 100 TB the shape is unchanged: one shuffle on user_id
    * per batch for the in-batch argmax, one co-partitionable full-outer
    * join against the snapshot (bucket both by user_id to make it
    * shuffle-free), and old versions age out by retention. */
  def latestPerUser(batch: Dataset[Event]): DataFrame =
    batch.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("m.ts").as("ts"),
        col("m.event_id").as("event_id"), col("m.value").as("value"))

  private def snapshotVersions(spark: org.apache.spark.sql.SparkSession,
                               stateDir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v"))
      .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
  }

  /** One micro-batch of the CDC upsert (public so the retry-idempotence
    * property is testable without driving a real stream). */
  def applyCdcBatch(batch: Dataset[Event], stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val upd = latestPerUser(batch)
    val prev = snapshotVersions(spark, stateDir).filter(_ < batchId).sorted.lastOption
    val merged = prev match {
      case None => upd
      case Some(v) =>
        val u = upd.select(col("user_id"),
          struct(col("ts"), col("event_id"), col("value")).as("mu"))
        val o = spark.read.parquet(s"$stateDir/v$v").select(col("user_id"),
          struct(col("ts"), col("event_id"), col("value")).as("mo"))
        u.join(o, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            when(col("mo").isNull, col("mu"))
              .when(col("mu").isNull, col("mo"))
              .when(col("mu") > col("mo"), col("mu")).otherwise(col("mo")).as("m"))
          .select(col("user_id"), col("m.ts").as("ts"),
            col("m.event_id").as("event_id"), col("m.value").as("value"))
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
  }

  /** The checkpoint keeps batchIds monotonic across restarts: without it a
    * restarted query re-numbers from 0, applyCdcBatch sees no "versions
    * strictly below" and writes low-numbered snapshots that cdcSnapshot's
    * max-version read would ignore. Checkpoint defaults to a sibling of
    * stateDir so one stateDir == one monotonic version history. */
  def cdcUpsertSink(events: Dataset[Event], stateDir: String,
                    checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir.getOrElse(s"$stateDir.checkpoint"))
      .foreachBatch((b: Dataset[Event], id: Long) => applyCdcBatch(b, stateDir, id))
      .start()

  /** The latest committed snapshot (empty schema-less read guarded by the
    * caller; tests always write at least one batch first). */
  def cdcSnapshot(spark: org.apache.spark.sql.SparkSession, stateDir: String): DataFrame = {
    val vs = snapshotVersions(spark, stateDir)
    require(vs.nonEmpty, s"no snapshot versions under $stateDir")
    spark.read.parquet(s"$stateDir/v${vs.max}")
  }

  /** Custom stateful op: running per-user event counter via
    * flatMapGroupsWithState (unbounded keys would use a TTL timeout). */
  def runningUserCounts(events: Dataset[Event]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          Iterator.single((user, next))
      }
  }
}
