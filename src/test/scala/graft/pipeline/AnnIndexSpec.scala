package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** The persisted-index contract: search over a LOADED index equals the
  * in-session index exactly, with zero training work on the read path,
  * and the loaders refuse uncommitted or mismatched artifacts. */
class AnnIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("persisted IVF/PQ/LSH search == in-session search; zero training on read") {
    val idx = Files.createTempDirectory("graft-annindex").toString + "/idx"
    // in-session results first (trains + memoizes the quantizers)
    val ivf = rows(Ann.annIvf(spark, sf))
    val pq = rows(Ann.annPq(spark, sf))
    val lsh = rows(Ann.annLsh(spark, sf))
    AnnIndex.build(spark, sf, idx)

    // the read path must not retrain: clear the training memos and
    // assert they STAY empty through all three searches
    Ann.clearTrainedCaches()
    assert(rows(AnnIndex.searchIvf(spark, sf, idx)) === ivf)
    assert(rows(AnnIndex.searchPq(spark, sf, idx)) === pq)
    assert(rows(AnnIndex.searchLsh(spark, sf, idx)) === lsh)
    assert(Ann.trainedCacheSizes === ((0, 0)),
      "a persisted-index search retrained a quantizer")

    // the inverted file is the serving layout: cid is a PARTITION dir
    val cells = new java.io.File(s"$idx/ivf_cells").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(cells.nonEmpty && cells.forall(_.startsWith("cid=")))
  }

  test("loaders refuse an uncommitted index and a corpus mismatch") {
    val root = Files.createTempDirectory("graft-annindex-bad").toString
    // uncommitted: data dirs but no manifest (a crashed build's shape)
    val uncommitted = s"$root/partial"
    spark.range(3).write.parquet(s"$uncommitted/ivf_centroids")
    val e1 = intercept[IllegalArgumentException] {
      AnnIndex.searchIvf(spark, sf, uncommitted)
    }
    assert(e1.getMessage.contains("not a committed index"))

    // corpus mismatch: an index built from sf0.001 must refuse to serve
    // a different corpus (ids would silently misresolve)
    val idx = s"$root/idx"
    AnnIndex.build(spark, sf, idx)
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.searchIvf(spark, "/root/testdata/sf0.01", idx)
    }
    assert(e2.getMessage.contains("different corpus"))

    // param mismatch: expected params come from the CALLER, so an index
    // built with a different quantizer geometry is refused, not silently
    // served with different semantics than the in-session twin
    val e3 = intercept[IllegalArgumentException] {
      AnnIndex.searchIvf(spark, sf, idx, c = 32)
    }
    assert(e3.getMessage.contains("search expects 32"))
    val e4 = intercept[IllegalArgumentException] {
      AnnIndex.searchPq(spark, sf, idx, m = 8)
    }
    assert(e4.getMessage.contains("search expects 8"))
  }

  test("publish is two-rename: a crash window leaves a restorable index, never zero") {
    val root = Files.createTempDirectory("graft-annindex-pub").toString
    val idx = s"$root/idx"
    AnnIndex.build(spark, sf, idx)
    val want = rows(AnnIndex.searchLsh(spark, sf, idx))
    // simulate the crash between the two publish renames of a REBUILD:
    // the live index retired to .old, the replacement never renamed in
    assert(new java.io.File(idx).renameTo(new java.io.File(s"$root/idx.old")))
    // loaders self-heal the retired copy instead of erroring
    assert(rows(AnnIndex.searchLsh(spark, sf, idx)) === want)
    assert(new java.io.File(idx).isDirectory)
    assert(!new java.io.File(s"$root/idx.old").exists())
  }

  test("a leftover build.tmp never shadows the published index; rebuild replaces") {
    val root = Files.createTempDirectory("graft-annindex-tmp").toString
    val idx = s"$root/idx"
    AnnIndex.build(spark, sf, idx)
    val first = rows(AnnIndex.searchLsh(spark, sf, idx))
    // simulate a crashed later build: stale tmp beside the live index
    val staleTmp = new java.io.File(s"$root/idx.build.tmp")
    assert(staleTmp.mkdirs())
    Files.write(staleTmp.toPath.resolve("junk"), Array[Byte](1, 2, 3))
    // reads ignore the tmp entirely
    assert(rows(AnnIndex.searchLsh(spark, sf, idx)) === first)
    // a rebuild clears the stale tmp and republishes atomically
    AnnIndex.build(spark, sf, idx)
    assert(!staleTmp.exists())
    assert(rows(AnnIndex.searchLsh(spark, sf, idx)) === first)
  }
}
