package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr

/** Stream/batch equivalence and watermark semantics (SURVEY §2.3). */
class EventStreamsSuite extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** transformWithState needs multiple state column families -> RocksDB
    * provider (ships with Spark; the HDFS-backed default rejects it).
    * Sets the provider for the body, restores the previous conf after. */
  private def withRocksDBStateStore[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val rows = Seq(
    Event(1, ts("2024-01-01 10:05:00"), 1, "view", 10.0),
    Event(2, ts("2024-01-01 10:20:00"), 1, "click", 5.0),
    Event(3, ts("2024-01-01 10:40:00"), 2, "view", 7.5),
    Event(4, ts("2024-01-01 11:10:00"), 1, "view", 2.5),
    Event(5, ts("2024-01-01 12:55:00"), 2, "purchase", 99.0))

  test("tumbling window: stream (complete mode) equals batch") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumb_stream")
      .outputMode("complete").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      val streamed = spark.table("tumb_stream")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.tumblingCounts(rows.toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("session windows: 29-minute gap merges, 31-minute gap splits") {
    import spark.implicits._
    val boundary = Seq(
      Event(1, ts("2024-01-01 08:00:00"), 7, "view", 1.0),
      Event(2, ts("2024-01-01 08:29:00"), 7, "view", 1.0), // 29 min: same session
      Event(3, ts("2024-01-01 09:00:00"), 7, "view", 1.0)) // 31 min: new session
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete").start()
    try {
      input.addData(boundary)
      q.processAllAvailable()
      val sessions = spark.table("sess_stream")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(sessions === Set(
        (7L, "2024-01-01 08:00:00", 2L),
        (7L, "2024-01-01 09:00:00", 1L)))
    } finally q.stop()
  }

  test("session windows: exactly-30-minute gap MERGES in both stream and batch") {
    import spark.implicits._
    val boundary = Seq(
      Event(1, ts("2024-01-01 08:00:00"), 7, "view", 1.0),
      Event(2, ts("2024-01-01 08:30:00"), 7, "view", 1.0), // exactly gap: merges
      Event(3, ts("2024-01-01 09:30:01"), 7, "view", 1.0)) // gap + 1s: splits
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_edge_stream")
      .outputMode("complete").start()
    try {
      input.addData(boundary)
      q.processAllAvailable()
      val streamed = spark.table("sess_edge_stream")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // session_window merges end-touching sessions: 08:30:00 extends the
      // [08:00, 08:30) window rather than opening a new one
      assert(streamed === Set(
        (7L, "2024-01-01 08:00:00", 2L),
        (7L, "2024-01-01 09:30:01", 1L)))
      // batch twin (strict > gap split) must agree at the exact boundary
      val batch = graft.queries.TimeSeries.sessionize(boundary.toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch === Set((7L, 1L, 2L), (7L, 2L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range-theta twin") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 10:03:00"), 1, "purchase", 9.0), // within 5 min: pair (1,2)
      Event(3, ts("2024-01-01 10:05:00"), 1, "purchase", 9.0), // exactly 5 min: pair (1,3)
      Event(4, ts("2024-01-01 10:06:00"), 1, "purchase", 9.0), // past 5 min: no pair
      Event(5, ts("2024-01-01 10:00:00"), 2, "view", 1.0),
      Event(6, ts("2024-01-01 10:04:00"), 3, "purchase", 9.0)) // other user: no pair
    val vIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val q = EventStreams.conversionPairs(vIn.toDF(), pIn.toDF())
      .writeStream.format("memory").queryName("conv_stream")
      .outputMode("append").start()
    try {
      vIn.addData(events.filter(_.event_type == "view"))
      pIn.addData(events.filter(_.event_type == "purchase"))
      q.processAllAvailable()
      // advance both watermarks so all joinable state is emitted
      vIn.addData(Event(90, ts("2024-01-01 12:00:00"), 9, "view", 0.0))
      pIn.addData(Event(91, ts("2024-01-01 12:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("conv_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === Set((1L, 2L), (1L, 3L)))
      // batch twin on the same rows (same join condition, no watermarks)
      val df = events.toDF()
      val batch = df.filter($"event_type" === "view")
        .select($"event_id".as("view_id"), $"user_id", $"ts".as("vts"))
        .join(df.filter($"event_type" === "purchase")
          .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("pts")),
          $"user_id" === $"p_user" && $"pts" > $"vts" &&
            $"pts" <= $"vts" + expr("INTERVAL 5 MINUTES"))
        .select("view_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched views with null purchase") {
    import spark.implicits._
    val vIn = MemoryStream[Event](spark)
    val pIn = MemoryStream[Event](spark)
    val q = EventStreams.conversionPairsOuter(vIn.toDF(), pIn.toDF())
      .writeStream.format("memory").queryName("conv_outer_stream")
      .outputMode("append").start()
    try {
      vIn.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),  // converts (2)
        Event(5, ts("2024-01-01 10:00:00"), 2, "view", 1.0))) // abandoned
      pIn.addData(Seq(Event(2, ts("2024-01-01 10:03:00"), 1, "purchase", 9.0)))
      q.processAllAvailable()
      // advance both watermarks far enough to close view 5's horizon
      vIn.addData(Event(90, ts("2024-01-01 12:00:00"), 9, "view", 0.0))
      pIn.addData(Event(91, ts("2024-01-01 12:00:00"), 9, "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("conv_outer_stream")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(rows.contains((1L, Some(2L))), s"matched pair missing: $rows")
      assert(rows.contains((5L, None)), s"abandoned view missing: $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes the duplicate event_id") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(rows :+ Event(1, ts("2024-01-01 10:05:00"), 1, "view", 10.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from windowed aggregation") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(Event(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window
      input.addData(Seq(Event(2, ts("2024-01-01 13:00:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      // this event is 2.5 h behind the watermark: must be discarded
      input.addData(Seq(Event(3, ts("2024-01-01 10:10:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      input.addData(Seq(Event(4, ts("2024-01-01 15:00:00"), 1, "view", 1.0)))
      q.processAllAvailable()
      val out = spark.table("late_stream")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(out("2024-01-01 10:00:00") === 1L, s"late row must not count: $out")
    } finally q.stop()
  }

  test("watermark boundary property: late-arrival sweep around the 10-minute delay") {
    import spark.implicits._
    // Property: with watermark = max-event-ts - 10 min, the [10:00, 11:00)
    // window's state is evicted once the watermark REACHES the window end —
    // i.e. once an event at 11:10 + d with d >= 0 has been seen. A late
    // 10:30 arrival is therefore counted iff d < 0. Sweeping d in minutes
    // across the boundary pins the inclusive/exclusive edge empirically
    // (the same discipline as the 30:00 session-gap pin): d = 0 DROPS.
    val results = Seq(-2, -1, 0, 1, 2).zipWithIndex.map { case (d, idx) =>
      val input = MemoryStream[Event](spark)
      val name = s"wm_sweep_$idx"
      val q = EventStreams.tumblingCounts(input.toDF(), watermark = "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(Seq(Event(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0)))
        q.processAllAvailable()
        // advance max event time to 11:10 + d  ->  watermark = 11:00 + d
        input.addData(Seq(Event(2,
          new Timestamp(ts("2024-01-01 11:10:00").getTime + d * 60000L), 1, "view", 1.0)))
        q.processAllAvailable()
        input.addData(Seq(Event(3, ts("2024-01-01 10:30:00"), 1, "view", 1.0)))
        q.processAllAvailable()
        // flush every remaining window
        input.addData(Seq(Event(4, ts("2024-01-01 20:00:00"), 1, "view", 1.0)))
        q.processAllAvailable()
        val n = spark.table(name).collect()
          .filter(_.getString(0) == "2024-01-01 10:00:00").map(_.getLong(2)).sum
        d -> n
      } finally q.stop()
    }
    results.foreach { case (d, n) =>
      val want = if (d < 0) 2L else 1L
      assert(n === want, s"offset ${d}min: window count $n, expected $want " +
        s"(late row ${if (d < 0) "kept" else "dropped"}); all: $results")
    }
  }

  test("graft_topk aggregates under streaming complete mode and updates across batches") {
    import spark.implicits._
    // the MG summary is a TypedImperativeAggregate, so it runs in a
    // streaming aggregation like any built-in: heavy-hitter monitoring
    // over a live event stream with bounded state
    val input = MemoryStream[Event](spark)
    val q = input.toDF()
      .selectExpr("user_id")
      .agg(expr("graft_topk(user_id, 2, 64)").as("tk"))
      .selectExpr("explode(tk) AS e").selectExpr("e.key AS k", "e.cnt AS c")
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      input.addData((1 to 10).map(i =>
        Event(i, ts("2024-01-01 10:00:00"), if (i <= 7) 1L else 2L, "view", 1.0)))
      q.processAllAvailable()
      val b1 = spark.table("topk_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(b1 === Map(1L -> 7L, 2L -> 3L))
      // second batch flips the leader; complete mode re-emits the new top
      input.addData((11 to 30).map(i =>
        Event(i, ts("2024-01-01 10:01:00"), 2L, "view", 1.0)))
      q.processAllAvailable()
      val b2 = spark.table("topk_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(b2 === Map(2L -> 23L, 1L -> 7L))
    } finally q.stop()
  }

  test("transformWithState keeps a running per-user count across batches") {
    import spark.implicits._
    withRocksDBStateStore {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.runningUserCountsTWS(input.toDS())
      .writeStream.format("memory").queryName("tws_stream")
      .outputMode("update").start()
    try {
      input.addData(rows.take(3)) // user 1: 2 events, user 2: 1
      q.processAllAvailable()
      input.addData(rows.drop(3)) // user 1: +1, user 2: +1
      q.processAllAvailable()
      val last = spark.table("tws_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, vs) => (u, vs.map(_._2).max) }
      assert(last === Map(1L -> 3L, 2L -> 2L))
    } finally q.stop()
    }
  }

  test("timer-driven sessionization emits on watermark passing the gap") {
    import spark.implicits._
    withRocksDBStateStore {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionTimeouts(input.toDS())
      .writeStream.format("memory").queryName("timer_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "view", 1.0)))
      q.processAllAvailable()
      // no session closed yet: watermark is at 10:10, timer armed for 10:40
      assert(spark.table("timer_stream").isEmpty)
      // push the watermark past 10:40 -> user 7's session must close
      input.addData(Seq(Event(3, ts("2024-01-01 12:00:00"), 9, "view", 1.0)))
      q.processAllAvailable()
      val sessions = spark.table("timer_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expiry = ts("2024-01-01 10:40:00").getTime
      assert(sessions === Set((7L, 2L, expiry)))
    } finally q.stop()
    }
  }

  test("timer sessionization closes an expired session even when the event beats the watermark") {
    import spark.implicits._
    withRocksDBStateStore {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionTimeouts(input.toDS())
      .writeStream.format("memory").queryName("timer_edge_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0)))
      q.processAllAvailable()
      // 11:00 is > gap after 10:00, but the watermark (10:00) hasn't
      // reached the 10:30 expiry yet — the input path must close session 1
      input.addData(Seq(Event(2, ts("2024-01-01 11:00:00"), 7, "view", 1.0)))
      q.processAllAvailable()
      val afterInline = spark.table("timer_edge_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(afterInline === Set((7L, 1L, ts("2024-01-01 10:30:00").getTime)))
      // then the timer closes session 2 once the watermark passes 11:30
      input.addData(Seq(Event(3, ts("2024-01-01 13:00:00"), 9, "view", 1.0)))
      q.processAllAvailable()
      val all = spark.table("timer_edge_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(all === Set(
        (7L, 1L, ts("2024-01-01 10:30:00").getTime),
        (7L, 1L, ts("2024-01-01 11:30:00").getTime)))
    } finally q.stop()
    }
  }

  test("flatMapGroupsWithState keeps a running per-user count across batches") {
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.runningUserCounts(input.toDS())
      .writeStream.format("memory").queryName("counter_stream")
      .outputMode("update").start()
    try {
      input.addData(rows.take(3)) // user 1: 2 events, user 2: 1
      q.processAllAvailable()
      input.addData(rows.drop(3)) // user 1: +1, user 2: +1
      q.processAllAvailable()
      val last = spark.table("counter_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, vs) => (u, vs.map(_._2).max) }
      assert(last === Map(1L -> 3L, 2L -> 2L))
    } finally q.stop()
  }

  test("CDC upsert sink: batch-split invariant, retry-idempotent, equals the batch argmax") {
    import spark.implicits._
    val all = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 11:00:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 09:00:00"), 2, "view", 3.0),
      Event(4, ts("2024-01-01 12:00:00"), 2, "purchase", 4.0),
      // out-of-order ACROSS batches: user 1's latest event arrives in batch
      // 1 of split A but batch 2 of split B — the global (ts, event_id)
      // argmax must win either way
      Event(5, ts("2024-01-01 13:00:00"), 1, "purchase", 5.0),
      Event(6, ts("2024-01-01 08:00:00"), 3, "signup", 6.0))
    val expected = Map(1L -> (5L, 5.0), 2L -> (4L, 4.0), 3L -> (6L, 6.0))

    def runSplit(splits: Seq[Seq[Event]]): Map[Long, (Long, Double)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
      val input = MemoryStream[Event](spark)
      val q = EventStreams.cdcUpsertSink(input.toDS(), dir)
      try {
        splits.foreach { s => input.addData(s); q.processAllAvailable() }
      } finally q.stop()
      val snap = EventStreams.cdcSnapshot(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      // retry-idempotence: re-applying the LAST batch with its batchId
      // must leave the snapshot unchanged (reads only versions below it)
      EventStreams.applyCdcBatch(splits.last.toDS(), dir, splits.size - 1L)
      val again = EventStreams.cdcSnapshot(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(again === snap, "retry changed the snapshot")
      snap
    }

    val a = runSplit(Seq(all.take(5), all.drop(5)))
    val b = runSplit(Seq(all.take(2), all.slice(2, 4), all.drop(4)))
    assert(a === expected)
    assert(b === expected)
  }

  test("CDC upsert sink: query restart keeps batchIds monotonic (checkpointed)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-restart").toString
    val input = MemoryStream[Event](spark)
    // run 1: two batches (versions v0, v1 under dir.checkpoint's numbering)
    val q1 = EventStreams.cdcUpsertSink(input.toDS(), dir)
    try {
      input.addData(Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0)))
      q1.processAllAvailable()
      input.addData(Seq(Event(2, ts("2024-01-01 11:00:00"), 2, "view", 2.0)))
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2 against the SAME stateDir: without the checkpoint the new query
    // would restart batchIds at 0, applyCdcBatch would read "versions below
    // 0" (none) and the user-1/user-2 history would be dropped from v0'
    val q2 = EventStreams.cdcUpsertSink(input.toDS(), dir)
    try {
      input.addData(Seq(Event(3, ts("2024-01-01 12:00:00"), 1, "click", 9.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    val snap = EventStreams.cdcSnapshot(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(snap === Map(1L -> (3L, 9.0), 2L -> (2L, 2.0)),
      s"restart lost pre-restart state: $snap")
  }

  test("attribution orders same-millisecond events by microsecond, like the batch twin") {
    import spark.implicits._
    // purchase at +100us precedes click at +900us INSIDE one millisecond:
    // a getTime-based sort would see equal millis and replay by event_id
    // (click first -> purchase credited 'click'); microsecond order must
    // credit 'direct'
    val t0 = ts("2024-01-01 10:00:00")
    def at(micros: Int): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(t0.getTime)
      t.setNanos(micros * 1000)
      t
    }
    withRocksDBStateStore {
      val input = MemoryStream[Event](spark)
      val q = EventStreams.attributionTWS(input.toDS())
        .writeStream.format("memory").queryName("attr_us")
        .outputMode("append").start()
      try {
        input.addData(Seq(
          Event(1, at(900), 1, "click", 1.0),
          Event(2, at(100), 1, "purchase", 9.0)))
        q.processAllAvailable()
        val got = spark.table("attr_us").collect().map(_.getString(0)).toSeq
        assert(got === Seq("direct"))
      } finally q.stop()
    }
  }

  test("attribution state machine matches the batch query across batch splits") {
    import spark.implicits._
    // user 1: view -> purchase (credit view), click -> purchase (credit
    // click, ACROSS the micro-batch boundary); user 2: purchase with no
    // touch (direct); user 3: touches only, no purchase -> no output
    val stream1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "purchase", 9.0),
      Event(3, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      Event(4, ts("2024-01-01 10:00:00"), 2, "purchase", 5.0),
      Event(5, ts("2024-01-01 10:00:00"), 3, "signup", 1.0))
    val stream2 = Seq(
      Event(6, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0),
      Event(7, ts("2024-01-01 11:30:00"), 3, "view", 1.0))
    withRocksDBStateStore {
      val input = MemoryStream[Event](spark)
      val q = EventStreams.attributionTWS(input.toDS())
        .writeStream.format("memory").queryName("attr_stream")
        .outputMode("append").start()
      try {
        input.addData(stream1)
        q.processAllAvailable()
        input.addData(stream2)
        q.processAllAvailable()
        val got = spark.table("attr_stream")
          .collect().map(r => (r.getString(0), r.getLong(1)))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        assert(got === Map(
          ("view", 1L) -> 1L, ("click", 1L) -> 1L, ("direct", 2L) -> 1L))
        // batch twin on the same rows, written as a parquet sfDir
        val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
        (stream1 ++ stream2)
          .map(e => (e.event_id, e.ts.getTime * 1000000L, e.user_id,
            e.event_type, e.value, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.parquet(s"$dir/events.parquet")
        val batch = graft.queries.TimeSeries.queries("q_ts_attribution")(spark, dir)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val streamedByChannel = spark.table("attr_stream")
          .collect().map(_.getString(0))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        assert(streamedByChannel === batch)
      } finally q.stop()
    }
  }
}
