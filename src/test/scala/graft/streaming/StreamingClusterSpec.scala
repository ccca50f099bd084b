package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.ClusterIndex

/** The streaming cluster-maintenance lane must converge to the one-shot
  * clustering of the whole corpus: an index built on the ~80% corpus
  * slice is grown by the ~20% batch slice arriving as 4 micro-batches
  * (file stream, one file per trigger) with a STOP + checkpoint restart
  * in the middle — the final membership must be row-identical to
  * `dedup_clusters_exact` over the full table (the same equivalence the
  * `dedup_clusters_incremental` CORRECTNESS row pins for the one-merge
  * case; here it must survive gen-by-gen sequential merges and a
  * restart). */
class StreamingClusterSpec extends SparkSpec {

  test("streamed appends across 4 micro-batches + restart == one-shot clustering") {
    val root = java.nio.file.Files.createTempDirectory("scluster").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val isBatch = pmod(col("doc_id") * 2246822519L, lit(100L)) >= 80

    // corpus-side index, built once on the 80% slice
    val corpusDir = s"$root/corpus"
    docs.filter(!isBatch).write.parquet(s"$corpusDir/documents.parquet")
    ClusterIndex.build(spark, corpusDir, s"$root/idx")

    // the arriving shard: 4 quartile files (any order would work — the
    // merge is order-independent — but a fixed order keeps the restart
    // deterministic)
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
      dst.setLastModified(1000000L * i)
    }
    (3 to 4).foreach { i =>
      new java.io.File(srcDir, f"docs$i%02d.parquet")
        .renameTo(new java.io.File(srcDir, f"hold$i%02d.hold"))
    }
    def run(): Unit = {
      val q = StreamingCluster.clusterMaintainStream(spark, srcDir,
        s"$root/idx", s"$root/cp", glob = "docs*.parquet", filesPerTrigger = 1)
      try q.processAllAvailable() finally q.stop()
    }
    run() // phase 1: quartiles 1-2, then STOP
    val gensAfter1 = ClusterIndex.members(spark, s"$root/idx") // readable mid-stream
    assert(gensAfter1.count() > 0)
    (3 to 4).foreach { i =>
      new java.io.File(srcDir, f"hold$i%02d.hold")
        .renameTo(new java.io.File(srcDir, f"docs$i%02d.parquet"))
    }
    run() // phase 2: RESTART from the checkpoint, quartiles 3-4

    val got = ClusterIndex.members(spark, s"$root/idx")
    val want = graft.pipeline.Dedup.dedupClustersExact(spark, sf)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0, "streamed membership not in one-shot")
    assert(want.exceptAll(got).count() === 0, "one-shot membership missing from stream")

    // a replayed batch is a no-op: run the stream again with a FRESH
    // checkpoint (every file re-delivered) — the covered ledger absorbs
    // all four batches without growing a generation
    // (read directly — Hadoop input formats skip _-prefixed files)
    def manifest(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/idx/_CLUSTER_MANIFEST.json")), "UTF-8")
    val gensBefore = manifest()
    val q2 = StreamingCluster.clusterMaintainStream(spark, srcDir,
      s"$root/idx", s"$root/cp2", glob = "docs*.parquet", filesPerTrigger = 1)
    try q2.processAllAvailable() finally q2.stop()
    val gensAfter = manifest()
    assert(gensAfter === gensBefore, "re-delivered batches must not commit generations")
  }

  test("50-micro-batch stream auto-compacts to O(1) gens, membership identical") {
    import org.apache.spark.sql.Row
    val root = java.nio.file.Files.createTempDirectory("scluster50").toString
    // deterministic jaccard structure: 10 families × 5 variants sharing
    // 7 of 8 tokens (3-gram jaccard 5/7 ≈ 0.71 within a family, 0 across)
    // + 10 singletons of unique tokens (never pair)
    def famText(f: Int, v: Int): String =
      ((0 until 7).map(w => s"w${f}x$w") :+ s"v$v").mkString(" ")
    def singText(i: Int): String = (0 until 8).map(w => s"s${i}y$w").mkString(" ")
    val baseDocs = (0 until 10).map(f => (f * 5L, famText(f, 0)))
    val streamDocs =
      (for { f <- 0 until 10; v <- 1 until 5 } yield (f * 5L + v, famText(f, v))) ++
        (0 until 10).map(i => (1000L + i, singText(i)))
    def toDf(docs: Seq[(Long, String)]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.map { case (id, t) => Row(id, t, "en", "fixture", t.length.toLong) }),
        Streaming.docSchema)

    val corpusDir = s"$root/corpus"
    toDf(baseDocs).coalesce(1).write.parquet(s"$corpusDir/documents.parquet")
    ClusterIndex.build(spark, corpusDir, s"$root/idx")

    // 50 single-doc files = 50 micro-batches at one file per trigger
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    val tmp = s"$root/stage"
    toDf(streamDocs.toSeq).repartitionByRange(50, col("doc_id")).write.parquet(tmp)
    val parts = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      val dst = new java.io.File(srcDir, f"docs$i%03d.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }

    val q = StreamingCluster.clusterMaintainStream(spark, srcDir,
      s"$root/idx", s"$root/cp", glob = "docs*.parquet",
      filesPerTrigger = 1, maxGens = 5)
    try q.processAllAvailable() finally q.stop()

    // the lifecycle tick kept the artifact at O(maxGens) generations
    val genDirs = new java.io.File(s"$root/idx").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen")).map(_.getName)
    assert(genDirs.length <= 5, s"auto-compact failed: ${genDirs.mkString(",")}")

    // membership identical to the one-shot clustering of all 60 docs
    val fullDir = s"$root/full"
    toDf((baseDocs ++ streamDocs).toSeq).coalesce(1)
      .write.parquet(s"$fullDir/documents.parquet")
    val want = graft.pipeline.Dedup.dedupClustersExact(spark, fullDir)
    val got = ClusterIndex.members(spark, s"$root/idx")
    assert(got.count() === 50L) // 10 families × 5 members; singletons absent
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0,
      "auto-compacted streamed membership != one-shot clustering")

    // crash MID-COMPACT (between the publish renames): live retired at
    // .old, a half-staged .build.tmp lying around — the next reader
    // self-heals and serves the identical membership
    val before = got.collect().map(_.toString).sorted.toSeq
    val idxF = new java.io.File(s"$root/idx")
    assert(idxF.renameTo(new java.io.File(s"$root/idx.old")))
    new java.io.File(s"$root/idx.build.tmp/gen0").mkdirs() // junk stage
    val healed = ClusterIndex.members(spark, s"$root/idx")
      .collect().map(_.toString).sorted.toSeq
    assert(healed === before, "crash mid-compact lost the committed artifact")
  }
}
