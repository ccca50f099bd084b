package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end exactly-once at 10×: replay a ScaleSmoke-style 10× event
  * corpus (ten id-shifted copies of the sf0.01 table — 100k events, the
  * sf0.1 volume) through the full `ingestWithRollup` data plane with a
  * MID-STREAM restart, and prove the recovered state equals the batch
  * fold. The restart is made adversarial: after phase 1 stops, the last
  * micro-batch's checkpoint COMMIT marker is deleted — simulating a crash
  * in the window after its data landed (and was possibly already rolled
  * up) but before the offset committed. The restarted query must
  * re-deliver that batch with the SAME block id (the persisted block
  * base), where the per-block Overwrite + the rollup manifest's tail
  * bound make the replay invisible — the crash-consistency contract
  * (GraftDBCrashSpec) exercised through the real streaming path at 10×
  * the test fixture.
  */
class StreamingScaleRestartSpec extends SparkSpec {

  private val Copies = 10
  private val IdShift = 10_000_000L
  private val Base = "/root/testdata/sf0.01"

  test("10x ingestWithRollup: mid-stream restart + replayed batch stays exactly-once") {
    val root = Files.createTempDirectory("graft-scale-restart").toString
    val srcDir = s"$root/src"; val cp = s"$root/cp"
    new java.io.File(srcDir).mkdirs()

    // ---- 10× corpus: one file per shifted copy (ScaleSmoke's id rule:
    // shift by copy·10^7, so key cardinality scales and nothing collides)
    val ev = graft.sources.Tables.eventsRaw(spark, Base)
    (0 until Copies).foreach { i =>
      val tmp = s"$root/tmp$i"
      ev.withColumn("event_id", col("event_id") + lit(i * IdShift))
        .withColumn("user_id", col("user_id") + lit(i * IdShift))
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"events$i%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1)) // deterministic pickup order
    }
    val perFile = ev.count()
    val total = perFile * Copies

    // hide the second half until the restart
    (Copies / 2 until Copies).foreach { i =>
      new java.io.File(srcDir, f"events$i%02d.parquet")
        .renameTo(new java.io.File(srcDir, f"later$i%02d.hold"))
    }

    val db = new graft.api.GraftDB(spark, s"$root/db")
    def run(): Unit = {
      // tiny thresholds so rollups fire between micro-batches — the
      // restart must cope with already-rolled replayed blocks
      val q = Streaming.ingestWithRollup(spark, srcDir, db, "rt", "events",
        maxTailBytes = 1L, maxBatchBytes = 256L * 1024,
        glob = "events*.parquet", filesPerTrigger = 1,
        checkpointLocation = cp)
      try q.processAllAvailable() finally q.stop()
    }

    run() // ---- phase 1: five files, then STOP mid-corpus
    val mid = db.collectionState("rt", "events")
    assert(mid === perFile * (Copies / 2), s"phase 1 landed $mid")

    // ---- crash injection: the last committed batch loses its commit
    // marker — on restart Spark re-runs it from the offset log, exactly
    // the data-landed/offset-uncommitted crash window
    val commits = new java.io.File(s"$cp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.length === Copies / 2, "one commit per micro-batch")
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc") // ChecksumFs sibling must go too
    assert(commits.last.delete(), "failed to delete the last commit marker")
    if (crc.exists()) crc.delete()

    (Copies / 2 until Copies).foreach { i =>
      new java.io.File(srcDir, f"later$i%02d.hold")
        .renameTo(new java.io.File(srcDir, f"events$i%02d.parquet"))
    }
    run() // ---- phase 2: RESTART — replays batch 4, then files 5..9

    // exactly-once: every event exactly once, none lost, none duplicated
    assert(db.collectionState("rt", "events") === total)
    val docs = db.collection("rt", "events").df
    val ids = docs.select(get_json_object(col("doc"), "$.event_id")
      .cast("long").as("eid"))
    assert(ids.distinct().count() === total, "duplicate event_ids after replay")

    // the doc state matches the batch fold: per-type counts == 10× batch
    val batchByType = graft.sources.Tables.events(spark, Base)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) * Copies).toMap
    val streamByType = docs
      .select(get_json_object(col("doc"), "$.event_type").as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamByType === batchByType)

    // rollup records: non-overlapping block ranges, nothing manifested
    // twice (an over-eager replay would re-roll block 4 — forbidden)
    val recs = db.scanRollupRecords("rt", "events")
      .select("start_block", "end_block").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(recs.nonEmpty, "10x ingest with 1-byte threshold must roll up")
    recs.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping rollup ranges: $hi >= $lo2")
      case _ =>
    }

    // sync status: last block == blocks 0..9 from the SAME persisted base
    // (a re-reserved base would show gaps past 9), count == the log size
    val st = db.syncStatus().find(s => s.db == "rt" && s.collection == "events").get
    assert(st.lastBlock === (Copies - 1).toLong,
      s"block ids must stay stable across the restart, got ${st.lastBlock}")

    // the persisted base survives for any further restart
    assert(Files.exists(Paths.get(cp, "graft_block_base")))

    // ---- sidecar-loss fail-fast: a checkpoint with committed offsets
    // but NO graft_block_base (manual deletion, partial copy) must
    // refuse to start — silently reserving a fresh base would re-land a
    // replayed batch under a new block id, the exact duplicate the
    // sidecar prevents
    Files.delete(Paths.get(cp, "graft_block_base"))
    val crcSidecar = Paths.get(cp, ".graft_block_base.crc")
    if (Files.exists(crcSidecar)) Files.delete(crcSidecar)
    val ex = intercept[IllegalStateException] {
      Streaming.ingestWithRollup(spark, srcDir, db, "rt", "events",
        maxTailBytes = 1L, maxBatchBytes = 256L * 1024,
        glob = "events*.parquet", filesPerTrigger = 1,
        checkpointLocation = cp)
    }
    assert(ex.getMessage.contains("graft_block_base"))
  }
}
