package graft.tools

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput lane — the committed artifact for the streaming
  * plane, like bench_skew.json for skew and bench_recall.json for
  * accuracy. StreamingScaleRestartSpec proves 100k-event CORRECTNESS;
  * this records the RATES and the state footprint round-over-round so a
  * streaming performance regression (a stateful operator growing its
  * store, the ingest path losing its per-partition write) is
  * machine-caught:
  *
  *  - ingest: a 10× id-shifted event corpus (ScaleSmoke's rule) driven
  *    through the full ingestWithRollup data plane (foreachBatch →
  *    appendDocumentsAt → size-triggered rollups), events/sec end to
  *    end plus the rollup count;
  *  - sessionize: the same stream through sessionizeWithTimeout,
  *    events/sec plus the state store's rows and bytes at the final
  *    watermark (the metric that decides whether state stays bounded);
  *  - ratelimit: the stream through the online quota twin, events/sec
  *    plus its trailing-hour state footprint and emitted violations.
  *
  * Run: sbt "runMain graft.tools.StreamingBench [baseDir] [copies]"
  */
object StreamingBench {
  private val IdShift = 10_000_000L

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- 10x corpus, one file per copy (deterministic micro-batches)
    val root = Files.createTempDirectory("graft_streambench").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()
    val ev = graft.sources.Tables.eventsRaw(spark, base)
    (0 until copies).foreach { i =>
      val tmp = s"$root/tmp$i"
      ev.withColumn("event_id", col("event_id") + lit(i * IdShift))
        .withColumn("user_id", col("user_id") + lit(i * IdShift))
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"events$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val total = ev.count() * copies

    val errors = scala.collection.mutable.ListBuffer.empty[String]
    var ingestEps = -1.0
    var rollups = -1L
    try {
      val db = new graft.api.GraftDB(spark, s"$root/db")
      val t0 = System.nanoTime()
      val q = graft.streaming.Streaming.ingestWithRollup(spark, srcDir, db,
        "rt", "events", maxTailBytes = 1L, maxBatchBytes = 256L * 1024,
        glob = "events*.parquet", filesPerTrigger = 1,
        checkpointLocation = s"$root/cp_ingest")
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val landed = db.collectionState("rt", "events")
      if (landed != total) errors += s"ingest landed $landed of $total"
      ingestEps = total / secs
      rollups = db.scanRollupRecords("rt", "events").count()
    } catch { case NonFatal(e) => errors += s"ingest: ${e.getMessage}" }

    var sessEps = -1.0
    var stateRows = -1L
    var stateBytes = -1L
    try {
      val t0 = System.nanoTime()
      val q = graft.streaming.Streaming
        .sessionizeWithTimeout(spark, srcDir, watermarkDelay = "1 hour",
          glob = "events*.parquet")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/cp_sess")
        .start()
      try {
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators
        if (so.nonEmpty) {
          stateRows = so.map(_.numRowsTotal).sum
          stateBytes = so.map(_.memoryUsedBytes).sum
        }
      } finally q.stop()
      sessEps = total / ((System.nanoTime() - t0) / 1e9)
    } catch { case NonFatal(e) => errors += s"sessionize: ${e.getMessage}" }

    var rateEps = -1.0
    var rateStateRows = -1L
    var rateStateBytes = -1L
    var rateViolations = -1L
    try {
      val t0 = System.nanoTime()
      val q = graft.streaming.Streaming
        .rateLimit(spark, srcDir, glob = "events*.parquet", filesPerTrigger = 1)
        .toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("bench_rate")
        .option("checkpointLocation", s"$root/cp_rate")
        .start()
      try {
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators
        if (so.nonEmpty) {
          rateStateRows = so.map(_.numRowsTotal).sum
          rateStateBytes = so.map(_.memoryUsedBytes).sum
        }
      } finally q.stop()
      rateEps = total / ((System.nanoTime() - t0) / 1e9)
      rateViolations = spark.table("bench_rate").count()
    } catch { case NonFatal(e) => errors += s"ratelimit: ${e.getMessage}" }

    spark.stop()

    val out = Paths.get("bench_streaming.json")
    val prevRe = "\"([a-z0-9_]+)\":([0-9.eE+-]+)".r
    val prev: Map[String, Double] =
      if (Files.exists(out)) {
        val txt = new String(Files.readAllBytes(out), "UTF-8")
        prevRe.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
      } else Map.empty
    def r1(d: Double): String = f"$d%.1f"
    // flag a >2x events/sec drop vs the previous committed record (the
    // same rule the uniform bench applies to per-query time)
    val flags = Seq(
      "ingest_events_per_sec" -> ingestEps,
      "sessionize_events_per_sec" -> sessEps,
      "ratelimit_events_per_sec" -> rateEps).collect {
      case (n, v) if v > 0 && prev.get(n).exists(p => p > 0 && p / v > 2.0) => n
    } ++ errors.map(_.takeWhile(_ != ':'))
    def prevStr(n: String): String =
      prev.get(n).map(p => s""","${n}_prev":${r1(p)}""").getOrElse("")
    def strArr(xs: Seq[String]): String = xs.map("\"" + _ + "\"").mkString(",")
    val json = s"""{"lane":"streaming","base":"$base","copies":$copies,""" +
      s""""events":$total,"flags":[${strArr(flags)}],""" +
      s""""errors":[${strArr(errors.toSeq)}],""" +
      s""""ingest_events_per_sec":${r1(ingestEps)}${prevStr("ingest_events_per_sec")},""" +
      s""""ingest_rollups":$rollups,""" +
      s""""sessionize_events_per_sec":${r1(sessEps)}${prevStr("sessionize_events_per_sec")},""" +
      s""""sessionize_state_rows":$stateRows,"sessionize_state_bytes":$stateBytes,""" +
      s""""ratelimit_events_per_sec":${r1(rateEps)}${prevStr("ratelimit_events_per_sec")},""" +
      s""""ratelimit_state_rows":$rateStateRows,"ratelimit_state_bytes":$rateStateBytes,""" +
      s""""ratelimit_violations":$rateViolations}"""
    Files.write(out, (json + "\n").getBytes("UTF-8"))
    println(json)
    println(s"[streaming-bench] wrote ${out.toAbsolutePath}")
    if (flags.nonEmpty) {
      System.err.println(s"[streaming-bench] flags: ${flags.mkString(",")}")
      sys.exit(1)
    }
  }
}
