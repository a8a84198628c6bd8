package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.exec.Scans
import graft.streaming.EventStreams

/** Real streaming-execution coverage: the same transforms the batch
  * queries declare, run as Structured Streaming queries (micro-batch)
  * through `readStream`/`writeStream` — file source parity with batch,
  * and watermark-driven append finalization.
  */
class StreamingSpec extends SparkSpecBase {

  test("file-source readStream windowed agg equals the batch result") {
    val batchEvents = Scans.table(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    // stream the same parquet as a file source, normalizing ts the same
    // representation-agnostic way Scans.table does. The file source
    // wants a directory, so stage the single file behind a symlink.
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .parquet(streamDir.toString)
    val streamEvents = Scans.normalizeTs(raw)
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    val q = EventStreams.windowedAgg(streamEvents)
      .writeStream.format("memory").queryName("swagg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT window_start, event_type, n_events, sum_value FROM swagg")
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    val batch = EventStreams.windowedAgg(batchEvents)
      .orderBy(col("window_start"), col("event_type")).collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("file-source readStream windowed histogram equals the batch result") {
    val batchEvents = Scans.table(spark, sfDir, "events")
      .select(col("ts"), col("value"))
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_hist")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .parquet(streamDir.toString)
    val streamEvents = Scans.normalizeTs(raw)
      .select(col("ts"), col("value"))
    val q = EventStreams.histogramStream(streamEvents)
      .writeStream.format("memory").queryName("shist")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT window_start, bucket, n_events, sum_value FROM shist")
      .orderBy(col("window_start"), col("bucket")).collect().toSeq
    val batch = EventStreams.histogramStream(batchEvents)
      .orderBy(col("window_start"), col("bucket")).collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // every bucket is a real fixed-width cell: 25*bucket <= sum/n < 25*(bucket+1)
    streamed.foreach { r =>
      val (b, n, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(s / n >= 25.0 * b - 1e-9 && s / n < 25.0 * (b + 1) + 1e-9)
    }
  }

  test("declared events_cdc_stream_equiv replay equals the batch cdc merge") {
    // the declared key runs a REAL streaming replay (file source →
    // flatMapGroupsWithState → memory sink) and must reproduce the batch
    // operator's rollup row for row — the equivalence the shared oracle
    // hash-checks, asserted engine-side here
    val streamed = SparkEntry.queries("events_cdc_stream_equiv")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("events_cdc_merge")(spark, sfDir)
      .collect().toSeq
    assert(streamed == batch)
  }

  test("declared stream dedup replay equals the batch distinct set") {
    // the declared key re-delivers every event in a second micro-batch;
    // the surviving set must be exactly the single table's rollup
    val streamed = SparkEntry.queries("events_stream_dedup_equiv")(spark, sfDir)
      .collect().toSeq
    val batch = Scans.table(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).cast("long").as("id_sum"),
        sum(expr("(unix_millis(ts) - pmod(unix_millis(ts), 1000)) div 1000"))
          .cast("long").as("sum_s"))
      .orderBy(col("event_type")).collect().toSeq
    assert(streamed == batch)
  }

  test("declared stream session replay equals the batch session_window") {
    val streamed = SparkEntry.queries("events_stream_session_equiv")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("events_session_window")(spark, sfDir)
      .collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("parquet-sink CDC replay restarts from checkpoint and converges") {
    import spark.implicits._
    import graft.streaming.EventStreams
    // stage the events table as TWO source files with the SAME users in
    // each (split on event_id parity), so the restarted query must
    // recover per-user flatMapGroupsWithState state from the checkpoint
    // to produce the correct survivors for the second batch
    val scratch = java.nio.file.Files.createTempDirectory("graft_ckpt_restart")
    val srcDir = java.nio.file.Files.createDirectory(scratch.resolve("src"))
    val sinkDir = scratch.resolve("sink").toString
    val ckptDir = scratch.resolve("ckpt").toString
    val events = Scans.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    def stageHalf(parity: Int, name: String): Unit = {
      val tmp = scratch.resolve(s"half$parity")
      events.filter(col("event_id") % 2 === parity)
        .coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.move(p, srcDir.resolve(name)); moved = true
        }
      }
      assert(moved, s"no part file written for half $parity")
    }
    def runStream(): Unit = {
      val in = spark.readStream
        .schema(events.schema)
        .parquet(srcDir.toString)
        .withColumn("ms", unix_millis(col("ts")))
        .select(col("user_id").as("userId"), col("ms"),
          col("event_id").as("eventId"), col("event_type").as("eventType"))
        .as[EventStreams.LatestIn]
      val q = EventStreams.latestState(in)
        .writeStream.format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      stageHalf(0, "a.parquet")
      runStream() // run 1: even event_ids only; checkpoint commits batch 0
      val afterFirst = spark.read.parquet(sinkDir).count()
      assert(afterFirst > 0, "first run emitted nothing")
      stageHalf(1, "b.parquet")
      runStream() // run 2: RESTART from the checkpoint, sees only b.parquet
      // recover the snapshot from the committed files and compare to the
      // batch CDC merge over the full table — restart must converge on
      // the identical survivors
      val recovered = spark.read.parquet(sinkDir)
        .groupBy(col("userId"))
        .agg(max(struct(col("ms"), col("eventId"), col("eventType"))).as("b"))
        .select(col("userId").as("user_id"), col("b.ms").as("ms"),
          col("b.eventType").as("event_type"))
        .groupBy((col("user_id") % 20).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(expr("(ms - pmod(ms, 1000)) div 1000")).cast("long").as("sum_s"))
        .orderBy(col("bucket"), col("event_type"))
        .collect().toSeq
      val batch = SparkEntry.queries("events_cdc_merge")(spark, sfDir)
        .collect().toSeq
      assert(recovered == batch,
        "restarted file-sink replay diverged from the batch CDC merge")
      // the second run appended (did not reprocess batch 0): committed
      // output grew, proving the checkpoint resumed rather than restarted
      assert(spark.read.parquet(sinkDir).count() > afterFirst)
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(x => java.nio.file.Files.deleteIfExists(x))
      }
      rm(scratch)
    }
  }

  test("latest-state stream emits only changed survivors across micro-batches") {
    import spark.implicits._
    import graft.streaming.EventStreams.{LatestIn, LatestOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[LatestIn]
    val q = EventStreams.latestState(in.toDS())
      .writeStream.format("memory").queryName("slatest")
      .outputMode("append").start()
    def emitted(): Seq[LatestOut] = spark.sql("SELECT * FROM slatest")
      .as[LatestOut].collect().toSeq
    try {
      // batch 1: two updates for user 1 (same ms — event_id breaks the
      // tie), one for user 2
      in.addData(LatestIn(1L, 1000L, 7L, "view"), LatestIn(1L, 1000L, 9L, "click"),
        LatestIn(2L, 500L, 3L, "view"))
      q.processAllAvailable()
      assert(emitted().toSet ==
        Set(LatestOut(1L, 1000L, 9L, "click"), LatestOut(2L, 500L, 3L, "view")))
      // batch 2: a LATE update for user 1 (older ms — must not emit) and
      // a genuinely newer state for user 2 (must emit)
      in.addData(LatestIn(1L, 900L, 20L, "stale"), LatestIn(2L, 800L, 4L, "click"))
      q.processAllAvailable()
      assert(emitted().toSet ==
        Set(LatestOut(1L, 1000L, 9L, "click"), LatestOut(2L, 500L, 3L, "view"),
          LatestOut(2L, 800L, 4L, "click")))
    } finally q.stop()
  }

  test("attribution stream credits purchases to touches carried across micro-batches") {
    import spark.implicits._
    import graft.streaming.EventStreams.{AttrIn, AttrOut}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[AttrIn]
    val q = EventStreams.attributionStream(in.toDS())
      .writeStream.format("memory").queryName("sattr")
      .outputMode("append").start()
    def emitted(): Seq[AttrOut] = spark.sql("SELECT * FROM sattr")
      .as[AttrOut].collect().toSeq
    try {
      // batch 1: user 1 views then clicks (click is the later touch);
      // user 2 purchases with NO preceding touch → 'none'
      in.addData(AttrIn(1L, 1000L, 1L, "view"), AttrIn(1L, 2000L, 2L, "click"),
        AttrIn(2L, 1500L, 3L, "purchase"))
      q.processAllAvailable()
      assert(emitted().toSet == Set(AttrOut(2L, 3L, "none")))
      // batch 2: user 1 purchases — must credit the CLICK carried in
      // state from batch 1 (not 'none', not the older view)
      in.addData(AttrIn(1L, 3000L, 4L, "purchase"))
      q.processAllAvailable()
      assert(emitted().toSet ==
        Set(AttrOut(2L, 3L, "none"), AttrOut(1L, 4L, "click")))
    } finally q.stop()
  }

  test("stream-stream interval join matches in-window pairs, state bounded") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    def df(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStreams.intervalJoin(df(clicks), df(views))
      .writeStream.format("memory").queryName("ssij")
      .outputMode("append").start()
    try {
      views.addData(
        (100L, Timestamp.valueOf("2024-01-01 09:40:00"), 1L), // in window
        (101L, Timestamp.valueOf("2024-01-01 08:00:00"), 1L), // too old
        (102L, Timestamp.valueOf("2024-01-01 09:50:00"), 2L)) // other user
      clicks.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql("SELECT click_id, view_id, user_id FROM ssij").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 100L, 1L)))
    // and the same transform over batch frames gives the same pairs
    val bClicks = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("event_id", "ts", "user_id")
    val bViews = Seq(
      (100L, Timestamp.valueOf("2024-01-01 09:40:00"), 1L),
      (101L, Timestamp.valueOf("2024-01-01 08:00:00"), 1L),
      (102L, Timestamp.valueOf("2024-01-01 09:50:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val batch = EventStreams.intervalJoin(bClicks, bViews)
      .select(col("click_id"), col("view_id"), col("user_id")).collect()
    assert(batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 100L, 1L)))
  }

  test("streaming session_window merges events and finalizes by watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val sessions = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("ssw")
      .outputMode("append").start()
    try {
      // three events 10 min apart chain into ONE session for user 1
      mem.addData(
        (Timestamp.valueOf("2024-01-01 09:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 09:10:00"), 1L),
        (Timestamp.valueOf("2024-01-01 09:20:00"), 1L),
        (Timestamp.valueOf("2024-01-01 11:00:00"), 2L))
      q.processAllAvailable()
      // advance the watermark past 09:50 (session close) to finalize
      mem.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM ssw").collect()
      val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      assert(u1.length == 1 && u1.head.getAs[Long]("n_events") == 3,
        s"expected one merged 3-event session, got ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("event-time timeout evicts the trailing session when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val typed = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("_1"), col("ts").as("_2"))
      .as[(Long, Timestamp)]
    val q = EventStreams.sessionizeEventTime(typed)
      .writeStream.format("memory").queryName("ssevict")
      .outputMode("append").start()
    def emitted() = spark.sql(
      "SELECT user_id, session_start_ms, session_end_ms, n_events FROM ssevict")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    try {
      // batch 1: a three-event chain for user 1 — session stays OPEN
      // (watermark = 09:20 - 10 min = 09:10, far before its 09:50 close)
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 09:00:00")),
        (1L, Timestamp.valueOf("2024-01-01 09:10:00")),
        (1L, Timestamp.valueOf("2024-01-01 09:20:00")))
      q.processAllAvailable()
      assert(emitted().isEmpty,
        "open session emitted before the watermark passed its close")
      // batch 2: an event for ANOTHER user moves the watermark to 10:50,
      // past user 1's 09:50 close; the TIMEOUT (no rows for user 1) must
      // emit the session — Spark schedules the no-data timeout batch
      // itself once the new watermark can fire it
      mem.addData((2L, Timestamp.valueOf("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val s = Timestamp.valueOf("2024-01-01 09:00:00").getTime
      val e = Timestamp.valueOf("2024-01-01 09:20:00").getTime + 30L * 60 * 1000
      assert(emitted() == Set((1L, s, e, 3L)),
        s"expected exactly user 1's timed-out session, got ${emitted()}")
      // user 2's own session is still open (watermark never passed it)
      assert(!emitted().exists(_._1 == 2L))
    } finally q.stop()
  }

  test("a late cross-batch event extends the open session instead of shrinking it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val typed = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "20 minutes")
      .select(col("user_id").as("_1"), col("ts").as("_2"))
      .as[(Long, Timestamp)]
    val q = EventStreams.sessionizeEventTime(typed)
      .writeStream.format("memory").queryName("sslate")
      .outputMode("append").start()
    try {
      // batch 1: user 1's open session ends 10:00 (armed close 10:30)
      mem.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: a LATE event at 09:50 — admitted (watermark is 09:40)
      // and inside the gap. The session must keep last=10:00 (native
      // session_window's overlap merge), not regress to 09:50.
      mem.addData((1L, Timestamp.valueOf("2024-01-01 09:50:00")))
      q.processAllAvailable()
      // advance the watermark past the 10:30 close to evict
      mem.addData((2L, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT session_start_ms, session_end_ms, n_events FROM sslate " +
          "WHERE user_id = 1").collect()
      val start = Timestamp.valueOf("2024-01-01 09:50:00").getTime
      val end = Timestamp.valueOf("2024-01-01 10:00:00").getTime + 30L * 60 * 1000
      assert(rows.length == 1, s"expected one session, got ${rows.length}")
      assert(rows.head.getLong(0) == start,
        "late event did not extend the session start")
      assert(rows.head.getLong(1) == end,
        "late event regressed the session end (last must be the max)")
      assert(rows.head.getLong(2) == 2L)
    } finally q.stop()
  }

  test("a late event bridging two held sessions coalesces them, not two overlapping emits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val typed = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "20 minutes")
      .select(col("user_id").as("_1"), col("ts").as("_2"))
      .as[(Long, Timestamp)]
    val q = EventStreams.sessionizeEventTime(typed)
      .writeStream.format("memory").queryName("ssbridge")
      .outputMode("append").start()
    try {
      // batch 1: two same-batch events a full gap apart — TWO sessions
      // (10:00, close 10:30) and (10:35, close 11:05). Neither may emit
      // inline: the post-batch watermark is only 10:15, and an
      // admissible late event can still bridge them — native
      // session_window would then produce ONE merged session, so an
      // early emit of the first would publish an overlapping duplicate.
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
        (1L, Timestamp.valueOf("2024-01-01 10:35:00")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM ssbridge").collect().isEmpty,
        "a held session emitted before the watermark passed its close")
      // batch 2: the late bridge at 10:20 (admitted: watermark 10:15) —
      // within gap of BOTH sides, so the whole chain coalesces
      mem.addData((1L, Timestamp.valueOf("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // batch 3: advance the watermark past the merged close to emit
      mem.addData((2L, Timestamp.valueOf("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT session_start_ms, session_end_ms, n_events FROM ssbridge " +
          "WHERE user_id = 1").collect()
      val start = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      val end = Timestamp.valueOf("2024-01-01 10:35:00").getTime + 30L * 60 * 1000
      assert(rows.length == 1,
        s"bridged sessions must coalesce into ONE (native session_window " +
          s"merge), got ${rows.length}: ${rows.mkString(";")}")
      assert(rows.head.getLong(0) == start && rows.head.getLong(1) == end &&
        rows.head.getLong(2) == 3L, s"wrong merged session: ${rows.head}")
    } finally q.stop()
  }

  test("declared events_stream_session_timeout equals the native session_window replay") {
    val timedOut = SparkEntry.queries("events_stream_session_timeout")(spark, sfDir)
      .collect().toSeq
    val native = SparkEntry.queries("events_session_window")(spark, sfDir)
      .collect().toSeq
    assert(timedOut == native)
    assert(timedOut.nonEmpty)
  }

  test("streaming dedup drops re-delivered event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_id", "value")
    val q = EventStreams.dedupStream(events)
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0), // same batch dup
        (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, 2.0))
      q.processAllAvailable()
      // re-delivery in a LATER micro-batch, still inside the watermark
      mem.addData((Timestamp.valueOf("2024-01-01 10:02:00"), 1L, 1.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM sdedup")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L), s"expected first arrivals only, got $ids")
    } finally q.stop()
  }

  test("foreachBatch streams micro-batches into a JDBC destination") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val home = exec.DerbyEnv.home // one-time engine home, no re-pointing
    // fresh destination per run: the Derby db persists under tmpdir and
    // appends would accumulate across test invocations
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$home/stream_sink"))
    val url = s"jdbc:derby:$home/stream_sink;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val mem = MemoryStream[(Long, Double)]
    val q = EventStreams.streamToJdbc(
      mem.toDF().toDF("event_id", "value"), url, "stream_events", props)
    try {
      mem.addData((1L, 1.5), (2L, 2.5))
      q.processAllAvailable()
      mem.addData((3L, 3.5)) // second micro-batch appends
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.jdbc(url, "stream_events", props)
    assert(back.count() == 3)
    assert(back.agg(sum(col("value"))).collect()(0).getDouble(0) == 7.5)
    // every row is stamped with its micro-batch id — the replay-dedupe
    // key an idempotent consumer needs (two batches ran → two ids)
    assert(back.select(col("_batch_id")).distinct().count() == 2)
    // replay convergence: a crash between JDBC write and checkpoint
    // commit makes Spark re-run the last micro-batch with the SAME
    // batchId — the delete-then-insert upsert must converge to one copy
    import spark.implicits._
    val replay = Seq((3L, 3.5)).toDF("event_id", "value")
    EventStreams.upsertBatch(replay, 1L, url, "stream_events", props)
    EventStreams.upsertBatch(replay, 1L, url, "stream_events", props)
    val after = spark.read.jdbc(url, "stream_events", props)
    assert(after.count() == 3, "replayed micro-batch duplicated rows")
    assert(after.agg(sum(col("value"))).collect()(0).getDouble(0) == 7.5)
  }

  test("append mode emits a window only after the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "user_id", "value")
    val q = EventStreams.windowedAgg(events)
      .writeStream.format("memory").queryName("awagg")
      .outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1L, 1.5),
        (Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2L, 2.5))
      q.processAllAvailable()
      // watermark (max ts - 2h) hasn't passed the 10:00 window yet
      assert(spark.sql("SELECT * FROM awagg").count() == 0)
      // an event at 13:30 moves the watermark to 11:30 > 11:00 close
      mem.addData((Timestamp.valueOf("2024-01-01 13:30:00"), "view", 3L, 1.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 16:00:00"), "view", 3L, 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, event_type, n_events, sum_value FROM awagg")
        .orderBy(col("window_start")).collect()
      assert(rows.exists(r => r.getAs[Timestamp]("window_start") ==
        Timestamp.valueOf("2024-01-01 10:00:00") && r.getAs[Long]("n_events") == 2))
    } finally q.stop()
  }
}
