package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming window agg converges to the batch answer") {
    val q = Streaming.windowAgg(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_agg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("bucket"), col("event_type"), col("n"))
      val want = graft.events.EventQueries.evtWindowAgg(spark, sf)
        .select(col("bucket"), col("event_type"), col("n"))
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
    } finally q.stop()
  }

  test("stateless streaming DSIR scorer matches the batch scores") {
    val lam = graft.pipeline.Curation.dsirLambda(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val q = Streaming.dsirScoreStream(spark, sf, lam)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream").start()
    try {
      q.processAllAvailable()
      // the streaming plan is stateless: no state store operator at all
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"))
      val got = spark.table("dsir_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val want = graft.pipeline.Curation.pipelineDsir(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.keySet === want.keySet)
      want.foreach { case (id, (n, score)) =>
        val (gn, gscore) = got(id)
        assert(gn === n, s"doc $id token count")
        // batch sums rounded-λ decimals exactly; the stream sums the same
        // rounded values as doubles in token order — equal to 1e-6 after
        // both round to 6 decimals
        assert(math.abs(gscore - score) <= 1e-6, s"doc $id: $gscore vs $score")
      }
    } finally q.stop()
  }

  test("stream-static dim join matches the batch join and carries no state store") {
    val q = Streaming.joinDims(spark, sf)
      .writeStream.outputMode("append")
      .format("memory").queryName("dim_join").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dim_join")
      val want = graft.sources.Tables.events(spark, sf)
        .withColumn("ets", col("ts"))
        .join(graft.sources.Tables.customer(spark, sf),
          col("user_id") === col("c_custkey"), "left")
        .select(col("event_id"), col("ets"), col("user_id"),
          col("event_type"), col("value"), col("c_name"), col("c_mktsegment"))
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
      // a broadcast stream-static join is stateless: nothing to evict,
      // no watermark coupling, no shuffle added to the streaming side
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming heavy-hitters sketch converges to the batch top-k") {
    val q = Streaming.approxTopk(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("approx_topk").start()
    try {
      q.processAllAvailable()
      val got = spark.table("approx_topk")
        .select(col("event_type"), posexplode(col("hh")).as(Seq("r0", "e")))
        .select(col("event_type"), (col("r0") + 1).cast("long").as("rank"),
          col("e.key").as("user_id"), col("e.cnt").as("cnt"))
      val want = graft.events.EventQueries.evtApproxTopk(spark, sf)
      assert(want.count() > 0)
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
      // sketch state lives in the streaming aggregation's state store
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("streaming reservoir equals the batch bottom-k at end of stream") {
    val q = Streaming.reservoirSample(spark, sf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_reservoir").start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_reservoir")
        .select(col("event_type"), posexplode(col("sample")).as(Seq("r0", "e")))
        .select(col("event_type"), (col("r0") + 1).cast("long").as("rank"),
          col("e.h").as("h"), col("e.id").as("event_id"))
      // independent batch recomputation through the WINDOW path, not the
      // aggregate under test
      val m = 1L << 20
      val h1 = pmod(col("event_id") * 2654435761L, lit(m))
      val hh = pmod(h1.bitwiseXOR(shiftright(h1, 7)) * 2246822519L, lit(m))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("h").asc, col("event_id").asc)
      val want = graft.sources.Tables.eventsRaw(spark, sf)
        .select(col("event_type"), col("event_id"), hh.as("h"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 25)
        .select(col("event_type"), col("rank"), col("h"), col("event_id"))
      assert(want.count() > 0)
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join with bounded state") {
    val q = Streaming.streamStreamJoin(spark, sf)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join")
      val ev = graft.sources.Tables.events(spark, sf)
        .withColumn("ets", col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ets").as("c_ets"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("value").as("p_value"), col("ets").as("p_ets"))
      val want = clicks.join(purchases,
          col("c_user") === col("p_user") &&
            col("p_ets") >= col("c_ets") &&
            col("p_ets") <= col("c_ets") + expr("INTERVAL 1 HOUR"))
        .select(col("c_user").as("user_id"), col("click_id"),
          col("purchase_id"), col("c_ets"), col("p_ets"), col("p_value"))
      assert(want.count() > 0) // fixture actually exercises the join
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
      // symmetric-hash join state exists and the watermark bounds it:
      // rows behind the eviction horizon must have been removed
      val so = q.lastProgress.stateOperators
      assert(so.nonEmpty, "stream-stream join must carry join state")
      assert(so.exists(_.numRowsTotal > 0))
    } finally q.stop()
  }

  test("stateful doc state matches the batch latest-wins fold") {
    val q = Streaming.docState(spark, sf).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_state").start()
    try {
      q.processAllAvailable()
      // one batch → one emission per key; compare to the batch fold
      val got = spark.table("doc_state")
        .select(col("user_id"), col("last_type"), col("last_value"))
      val want = graft.docstore.DocQueries.docStateLatest(spark, sf)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).count() === 0)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per distinct content hash") {
    val q = Streaming.streamDedup(spark, sf)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
      val distinctHashes = graft.sources.Tables.events(spark, sf)
        .select(md5(to_binary(col("props"), lit("utf-8")))).distinct().count()
      assert(got.count() === distinctHashes)
      assert(got.select("content_hash").distinct().count() === distinctHashes)
    } finally q.stop()
  }

  test("streaming sessionize emits exactly the batch sessions that closed") {
    import org.apache.spark.sql.expressions.Window
    val q = Streaming.sessionize(spark, sf).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions")
      // the open (last) session per user stays in state; every other
      // batch session must have been emitted, bit-identical
      val w = Window.partitionBy(col("user_id"))
      val want = graft.events.EventQueries.evtSessionize(spark, sf)
        .withColumn("max_sid", max(col("session_id")).over(w))
        .filter(col("session_id") < col("max_sid"))
        .drop("max_sid")
      assert(want.count() > 0)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
    } finally q.stop()
  }

  test("sessionize with event-time timeout also flushes idle open sessions") {
    import org.apache.spark.sql.expressions.Window
    val q = Streaming.sessionizeWithTimeout(spark, sf).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_ttl").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_ttl")
      val gapUs = 1800L * 1000000
      // final watermark = max event time - 1h delay
      val wmUs = graft.sources.Tables.events(spark, sf)
        .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) - 3600L * 1000000
      val w = Window.partitionBy(col("user_id"))
      // expected: every closed batch session, PLUS each user's open last
      // session once it idled past the watermark — i.e. everything except
      // last sessions still inside the idle horizon
      val want = graft.events.EventQueries.evtSessionize(spark, sf)
        .withColumn("max_sid", max(col("session_id")).over(w))
        .withColumn("end_us", col("start_us") + col("dur_us"))
        .filter(!(col("session_id") === col("max_sid") &&
          col("end_us") + gapUs >= wmUs))
        .drop("max_sid", "end_us")
      assert(got.count() === want.count())
      assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
      // strictly more than the closed-by-successor-only variant: idle
      // sessions really flushed via the timeout
      val closedOnly = graft.events.EventQueries.evtSessionize(spark, sf)
        .withColumn("max_sid", max(col("session_id")).over(w))
        .filter(col("session_id") < col("max_sid")).count()
      assert(got.count() > closedOnly)
    } finally q.stop()
  }

  test("streaming rate-limit emits exactly the batch violations") {
    val q = Streaming.rateLimit(spark, sf).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_violations").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rate_violations")
      val want = graft.events.EventQueries.evtRateLimit(spark, sf)
      assert(want.count() > 0, "fixture must contain violations")
      assert(got.count() === want.count())
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
    } finally q.stop()
  }

  test("streaming rate-limit across many micro-batches equals the batch audit") {
    // time-ordered file slices → one micro-batch each: the watermark
    // ADVANCES between batches, so event-time timeouts actually fire
    // mid-stream and dropped keys must still produce every violation
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-rate-mb").toString
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    val slices = 8
    val ev = graft.sources.Tables.eventsRaw(spark, sf)
    val sliced = ev
      .withColumn("slice", ntile(slices).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("ts").asc, col("event_id").asc)))
    (1 to slices).foreach { i =>
      val tmp = s"$root/tmp$i"
      sliced.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"events$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * i) // deterministic pickup order
    }
    val q = Streaming.rateLimit(spark, srcDir,
        glob = "events*.parquet", filesPerTrigger = 1).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_violations_mb").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rate_violations_mb")
      val want = graft.events.EventQueries.evtRateLimit(spark, sf)
      assert(want.count() > 0)
      assert(got.count() === want.count())
      assert(got.exceptAll(want).count() === 0)
      assert(want.exceptAll(got).count() === 0)
      // the stream really ran many micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= slices - 1)
    } finally q.stop()
  }

  test("streaming rate-limit model: frames, lateness, watermark retention") {
    def mkState(prior: Option[Streaming.RateState], wmMs: Long) =
      org.apache.spark.sql.streaming.TestGroupState.create[Streaming.RateState](
        prior.map(org.apache.spark.api.java.Optional.of[Streaming.RateState])
          .getOrElse(org.apache.spark.api.java.Optional.empty[Streaming.RateState]()),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
        0L, org.apache.spark.api.java.Optional.of(wmMs), hasTimedOut = false)
    def ev(id: Long, us: Long) = Streaming.EvT(id, us * 1000L, 7L, "click",
      0.0, "{}", new java.sql.Timestamp(us / 1000L))

    // watermark 0: frames count exactly, and NOTHING is evictable — a
    // later batch may still deliver an older event whose frame reaches
    // back to any retained timestamp
    val s = mkState(None, 0L)
    val evs = Seq(0L, 10L, 3_599_000_000L, 3_600_000_000L, 7_300_000_000L)
      .zipWithIndex.map { case (us, i) => ev(i.toLong, us) }
    val out = Streaming.updateRateLimit(2L)(7L, evs.iterator, s).toList
    // frames: [0,10] n=2; [0,10,3599e6] n=3 VIOLATION; 3600e6 frames
    // (10, 3599e6, itself) n=3 VIOLATION (0 outside: 3600e6-3599999999
    // = 1 > 0); 7300e6 frames only itself
    assert(out.map(v => (v.ts_us, v.n_1h)) ==
      List((3_599_000_000L, 3L), (3_600_000_000L, 3L)))
    assert(s.getOption.get.recent ==
      Seq(0L, 10L, 3_599_000_000L, 3_600_000_000L, 7_300_000_000L))

    // a LATE batch (older event than retained state, still in horizon)
    // must not count the retained future in its own trailing frame
    val out2 = Streaming.updateRateLimit(9L)(7L, Iterator(ev(99L, 7_000_000_000L)), s).toList
    assert(out2.isEmpty)
    val out2b = Streaming.updateRateLimit(2L)(7L,
      Iterator(ev(100L, 7_000_000_001L)), s).toList
    // frame [3400000002, 7000000001]: 3599e6, 3600e6, 7e9, itself = 4
    assert(out2b.map(v => (v.ts_us, v.n_1h)) == List((7_000_000_001L, 4L)))

    // an advanced watermark evicts exactly the dead prefix: with wm =
    // 7300000 ms, ts < 7.3e9 − (1h−1) = 3700000001 µs can no longer be
    // framed by any survivable event — 0 and 10 go, 3599e6+ stay
    val s2 = mkState(s.getOption, 7_300_000L)
    val out3 = Streaming.updateRateLimit(9L)(7L, Iterator(ev(101L, 7_400_000_000L)), s2).toList
    assert(out3.isEmpty)
    assert(s2.getOption.get.recent ==
      Seq(7_000_000_000L, 7_000_000_001L, 7_300_000_000L, 7_400_000_000L))
    // retention horizon is exact at the ms boundary: T_max = 7.4e9 →
    // dead strictly past floor((T+1h−1)/1000) = 10999999 ms, so the
    // timeout lands at 11000000 ms — never one ms early
    assert(s2.getTimeoutTimestampMs.get() === 11_000_000L)

    // COMPLETENESS CONTRACT pin (scaladoc: out-of-order arrival can
    // UNDER-emit vs the batch audit; append mode cannot retract): with
    // maxPerHour=2, events at t=1e9 and t=2e9 arrive first and are
    // compliant (counts 1, 2); a LATE peer at t=5e8 then lands. The
    // batch audit over all three would flag t=2e9 (frame count 3), but
    // streaming already finalized it — the late event itself frames
    // only [t-1h, 5e8] = count 1, so NOTHING is emitted. This is the
    // known, documented divergence — if this assertion starts failing
    // because violations appear, the append-mode semantics changed.
    val s3 = mkState(None, 0L)
    val first = Streaming.updateRateLimit(2L)(7L,
      Iterator(ev(1L, 1_000_000_000L), ev(2L, 2_000_000_000L)), s3).toList
    assert(first.isEmpty)
    val late = Streaming.updateRateLimit(2L)(7L,
      Iterator(ev(3L, 500_000_000L)), s3).toList
    assert(late.isEmpty, "late peer must not retro-emit or self-flag")
    // the state DID absorb the late peer: the next in-horizon event
    // sees all three in its frame and violates with n=4
    val next = Streaming.updateRateLimit(2L)(7L,
      Iterator(ev(4L, 2_100_000_000L)), s3).toList
    assert(next.map(v => (v.ts_us, v.n_1h)) == List((2_100_000_000L, 4L)))
  }

  test("foreachBatch ingestion lands the stream in a GraftDB collection") {
    val db = new graft.api.GraftDB(spark,
      java.nio.file.Files.createTempDirectory("graft-ingest").toString)
    val q = Streaming.ingestToDb(spark, sf, db, "rt", "events")
    try q.processAllAvailable() finally q.stop()
    val n = db.collectionState("rt", "events")
    assert(n === graft.sources.Tables.events(spark, sf).count())
    // ingested docs are queryable through the doc-store surface
    val purchases = db.queryStr("rt", "events", "/[event_type = purchase] | count")
      .head().getLong(0)
    assert(purchases ===
      graft.sources.Tables.events(spark, sf).filter(col("event_type") === "purchase").count())
  }

  test("streaming intake triggers size-bounded rollups (the rollup-executor loop)") {
    val db = new graft.api.GraftDB(spark,
      java.nio.file.Files.createTempDirectory("graft-stream-rollup").toString)
    // split the table into 4 files so the stream delivers 4 micro-batches
    // (4 blocks) — the executor rolls the tail after each one
    val src = java.nio.file.Files.createTempDirectory("graft-evsplit").toString
    graft.sources.Tables.eventsRaw(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(src)
    val q = Streaming.ingestWithRollup(spark, src, db, "rt", "events",
      maxTailBytes = 1L, maxBatchBytes = 64L * 1024,
      glob = "part-*.parquet", filesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    // the tail crossed the threshold → it was drained into >1 size-bounded
    // batch, each with a persisted RollupRecord, and the GC was recorded
    val recs = db.scanRollupRecords("rt", "events").collect()
    assert(recs.length > 1, s"expected multiple rollup batches, got ${recs.length}")
    assert(db.scanGcRecords("rt", "events").count() >= 1)
    // the fold over rollups (+ empty tail) is byte-identical: every event
    // is still queryable through the doc-store surface
    assert(db.collectionState("rt", "events") ===
      graft.sources.Tables.events(spark, sf).count())
    val purchases = db.queryStr("rt", "events", "/[event_type = purchase] | count")
      .head().getLong(0)
    assert(purchases === graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count())
  }

  test("subscription push fans one stream out to topic-filtered sinks") {
    import Subscriptions._
    val root = java.nio.file.Files.createTempDirectory("graft-subs").toString
    val db = new graft.api.GraftDB(spark, s"$root/db")
    db.createCollection("rt", "c")
    db.addDocuments("rt", "c", (0 until 10).map(i => s"""{"v":$i}""")) // block 0
    db.addDocuments("rt", "c", (0 until 5).map(i => s"""{"w":$i}"""))  // block 1
    val subs = Seq(
      Subscription("alice", Set(TopicBlock)),
      Subscription("bob", Set(TopicBlock, TopicMutation)))
    val q = Subscriptions.subscribe(spark, s"$root/db/rt/c/mutations", subs, s"$root/out")
    try q.processAllAvailable() finally q.stop()
    // alice: block events only, one per block with its mutation count
    val alice = spark.read.parquet(s"$root/out/alice/block")
      .orderBy("block_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(alice.toSeq === Seq((0L, 10), (1L, 5)))
    assert(!new java.io.File(s"$root/out/alice/mutation").exists())
    // bob: both topics; mutation headers cover every log row
    val bobBlocks = spark.read.parquet(s"$root/out/bob/block").count()
    val bobMuts = spark.read.parquet(s"$root/out/bob/mutation")
    assert(bobBlocks === 2)
    assert(bobMuts.count() === 15)
    assert(bobMuts.select("block", "order").distinct().count() === 15)
  }

  test("checkpointed stream restarts exactly-once: stop mid-corpus, resume, no dups") {
    // the restart guarantee a long-running cluster job actually relies
    // on: offsets + window state recover from the checkpoint, already-
    // committed micro-batches are not re-emitted, new files continue
    // from where the stopped query left off
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("ckpt").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val cpDir = s"$root/cp"
    new java.io.File(srcDir).mkdirs()
    // four sequential time-quarter files (event-time order matches file
    // order, so watermark-closed windows are complete when they emit)
    val raw = graft.sources.Tables.eventsRaw(spark, sf).orderBy(col("ts"))
    val quarts = raw.withColumn("q", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
    (1 to 4).foreach { i =>
      val tmp = s"$root/tmp$i"
      quarts.filter(col("q") === i).drop("q")
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"events$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * i) // deterministic pickup order
    }
    // hide phase-2 files behind a non-matching suffix until restart
    (3 to 4).foreach { i =>
      new java.io.File(srcDir, f"events$i%02d.parquet")
        .renameTo(new java.io.File(srcDir, f"later$i%02d.hold"))
    }
    def run(): Unit = {
      val q = Streaming.windowAgg(spark, srcDir, "events*.parquet", 1)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", cpDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // phase 1: files 1-2, then STOP
    val afterPhase1 = spark.read.parquet(outDir).count()
    (3 to 4).foreach { i =>
      new java.io.File(srcDir, f"later$i%02d.hold")
        .renameTo(new java.io.File(srcDir, f"events$i%02d.parquet"))
    }
    run() // phase 2: RESTART from the checkpoint, files 3-4
    val out = spark.read.parquet(outDir)
    // exactly-once across the restart: a re-emitted batch would dup keys
    assert(out.groupBy("bucket", "event_type").count()
      .filter(col("count") > 1).count() === 0)
    // the resume made progress beyond phase 1's emissions
    assert(out.count() > afterPhase1 && afterPhase1 > 0)
    // every emitted window is watermark-complete → equals the batch agg
    val batch = spark.read.parquet(srcDir + "/")
      .withColumn("ets", timestamp_micros(expr("unix_micros(CAST(ts AS TIMESTAMP))")))
      .groupBy(date_trunc("hour", col("ets")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("bn"), sum(col("value")).as("bsum"))
    val joined = out.join(batch, Seq("bucket", "event_type"), "left")
    assert(joined.filter(col("bn").isNull).count() === 0)
    assert(joined.filter(col("n") =!= col("bn")).count() === 0)
    assert(joined.filter(abs(col("sum_value") - col("bsum")) > 1e-6).count() === 0)
  }

  test("TTL at intake drops expired events before state and sink") {
    import org.apache.spark.sql.functions._
    // nanos head of the fixture stream; TTL = trailing 3 days from it
    val maxTs = graft.sources.Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) * 1000L
    val ttl = 3L * 24 * 3600 * 1000000000L
    val cutoff = maxTs - ttl
    // docState with TTL equals the batch latest-wins fold over ONLY the
    // unexpired rows
    val q = Streaming.docState(spark, sf, ttlNanos = ttl, nowNanos = () => maxTs)
      .toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_state_ttl").start()
    try {
      q.processAllAvailable()
      val got = spark.table("doc_state_ttl")
      val evNs = graft.sources.Tables.events(spark, sf)
        .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      assert(got.filter(col("last_ts") < cutoff).count() === 0)
      val wantKeys = evNs
        .filter(col("ts") >= cutoff).select("user_id").distinct().count()
      assert(got.count() === wantKeys && wantKeys > 0)
      // and the TTL really excluded something
      assert(wantKeys < evNs.select("user_id").distinct().count() ||
        evNs.filter(col("ts") < cutoff).count() > 0)
    } finally q.stop()
    // the GraftDB intake path enforces the same TTL: no expired event_id
    // lands in the collection
    val db = new graft.api.GraftDB(spark,
      java.nio.file.Files.createTempDirectory("ttl_ingest").toString)
    val q2 = Streaming.ingestToDb(spark, sf, db, "rt", "events_ttl",
      ttlNanos = ttl, nowNanos = () => maxTs)
    try q2.processAllAvailable() finally q2.stop()
    val landed = db.collection("rt", "events_ttl").df
      .select(get_json_object(col("doc"), "$.event_id").cast("long").as("event_id"))
    val evNs2 = graft.sources.Tables.events(spark, sf)
      .withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    val expired = evNs2.filter(col("ts") < cutoff).select("event_id")
    assert(landed.join(expired, Seq("event_id"), "left_semi").count() === 0)
    val unexpired = evNs2.filter(col("ts") >= cutoff).count()
    assert(landed.count() === unexpired)
  }

  test("TTL intake filter is a Column predicate (stays in Tungsten)") {
    // both clock modes must plan a relational Filter on the raw nanos —
    // a typed lambda would show up as TypedFilter and force per-row
    // object deserialization in every streaming intake
    val injected = Streaming.withTtl(
      Streaming.readEventStream(spark, sf), 1000L, () => 42L)
      .queryExecution.analyzed.toString
    val wallClock = Streaming.withTtl(
      Streaming.readEventStream(spark, sf), 1000L)
      .queryExecution.analyzed.toString
    for (p <- Seq(injected, wallClock)) {
      assert(p.contains("Filter"))
      assert(!p.contains("TypedFilter"), "TTL compiled to a typed lambda")
      assert(!p.contains("DeserializeToObject"))
    }
    // the wall-clock cutoff derives from the batch timestamp
    assert(wallClock.contains("current_timestamp"))
  }

  test("idle-flushed sessions keep numbering monotone when the user returns") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    import Streaming.{EvT, SessState}
    def ev(tsNanos: Long, id: Long) = EvT(id, tsNanos, 7L, "click", 1.0, "{}",
      new java.sql.Timestamp(tsNanos / 1000000L))
    def st(prev: Option[SessState], wmMs: Long, timedOut: Boolean) =
      TestGroupState.create[SessState](
        prev.map(Optional.of[SessState]).getOrElse(Optional.empty[SessState]()),
        GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(wmMs), timedOut)
    // batch 1: two events inside the gap → one open session, nothing out
    val s1 = st(None, 0L, timedOut = false)
    val out1 = Streaming.updateSessionsWithTimeout(7L,
      Iterator(ev(0L, 1L), ev(60L * 1000000000L, 2L)), s1).toSeq
    assert(out1.isEmpty && s1.get.sessionId === 1L && s1.get.n === 2L)
    // idle timeout fires: session 1 flushes, the COUNTER survives as a
    // closed marker (the pre-r8 code removed state here and the next
    // session re-used (user_id, session_id) = (7, 1))
    val s2 = st(Some(s1.get), wmMs = 60000L + 1800000L + 1L, timedOut = true)
    val out2 = Streaming.updateSessionsWithTimeout(7L, Iterator.empty, s2).toSeq
    assert(out2.map(_.session_id) === Seq(1L))
    assert(s2.exists && s2.get.n === 0L && s2.get.sessionId === 1L)
    // the user returns hours later: numbering CONTINUES at 2
    val s3 = st(Some(s2.get), wmMs = 60000L + 1800000L + 1L, timedOut = false)
    val out3 = Streaming.updateSessionsWithTimeout(7L,
      Iterator(ev(7200L * 1000000000L, 3L)), s3).toSeq
    assert(out3.isEmpty && s3.get.sessionId === 2L && s3.get.n === 1L)
    val s4 = st(Some(s3.get), wmMs = 7200000L + 1800000L + 1L, timedOut = true)
    val out4 = Streaming.updateSessionsWithTimeout(7L, Iterator.empty, s4).toSeq
    assert(out4.map(_.session_id) === Seq(2L)) // no (7, 1) reuse, monotone
    // counter retention expires → the marker drops, state stays bounded
    val s5 = st(Some(s4.get), wmMs = 7200000L + 24L * 3600000L + 1L, timedOut = true)
    val out5 = Streaming.updateSessionsWithTimeout(7L, Iterator.empty, s5).toSeq
    assert(out5.isEmpty && !s5.exists)
  }

  test("doc state counts every mutation per key") {
    val q = Streaming.docState(spark, sf).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("doc_state_n").start()
    try {
      q.processAllAvailable()
      val total = spark.table("doc_state_n").agg(sum("n_mutations")).head().getLong(0)
      assert(total === graft.sources.Tables.events(spark, sf).count())
    } finally q.stop()
  }
}
