package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming incremental-dedup lane must equal the one-shot batch
  * `dedup_incremental` on the same slices: the batch slice arrives as
  * 4+ doc_id-ordered micro-batches (file stream, one file per trigger),
  * the query is STOPPED mid-corpus and restarted from its checkpoint,
  * and the union of per-micro-batch flag outputs is row-identical to
  * `Dedup.dedupIncremental` — exact_corpus / exact_batch /
  * neardup_corpus / kept, every doc exactly once. */
class StreamingDedupSpec extends SparkSpec {

  test("streamed flags across 4 micro-batches + restart == batch dedup_incremental") {
    val root = java.nio.file.Files.createTempDirectory("sdedup").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val isBatch = pmod(col("doc_id") * 2246822519L, lit(100L)) >= 80

    // corpus-side artifact, built once
    StreamingDedup.writeCorpusIndex(spark, docs.filter(!isBatch), s"$root/art")

    // the arriving shard: 4 doc_id-ordered quartile files
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    val quarts = docs.filter(isBatch).withColumn("q", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    (1 to 4).foreach { i =>
      val tmp = s"$root/tmp$i"
      quarts.filter(col("q") === i).drop("q").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"docs$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * i) // deterministic pickup order
    }
    // hide phase-2 files until the restart
    (3 to 4).foreach { i =>
      new java.io.File(srcDir, f"docs$i%02d.parquet")
        .renameTo(new java.io.File(srcDir, f"hold$i%02d.hold"))
    }
    def run(): Unit = {
      val q = StreamingDedup.incrementalDedupStream(spark, srcDir,
        s"$root/art", s"$root/state", s"$root/out", s"$root/cp",
        glob = "docs*.parquet", filesPerTrigger = 1)
      try q.processAllAvailable() finally q.stop()
    }
    run() // phase 1: quartiles 1-2, then STOP
    val afterPhase1 = spark.read.parquet(s"$root/out").count()
    assert(afterPhase1 > 0)
    (3 to 4).foreach { i =>
      new java.io.File(srcDir, f"hold$i%02d.hold")
        .renameTo(new java.io.File(srcDir, f"docs$i%02d.parquet"))
    }
    run() // phase 2: RESTART from the checkpoint, quartiles 3-4

    val out = spark.read.parquet(s"$root/out")
    // ≥4 micro-batches actually ran, and the restart made progress
    assert(new java.io.File(s"$root/out").listFiles()
      .count(_.getName.startsWith("batch=")) >= 4)
    assert(out.count() > afterPhase1)
    // every doc exactly once (a replayed batch would duplicate)
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
    // row-identical to the one-shot batch query on the same slices
    val got = out.select("doc_id", "exact_corpus", "exact_batch",
      "neardup_corpus", "kept")
    val want = graft.pipeline.Dedup.dedupIncremental(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0, "streamed flags not in batch result")
    assert(want.exceptAll(got).count() === 0, "batch flags missing from stream")
  }
}
