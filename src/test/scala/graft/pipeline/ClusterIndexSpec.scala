package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The persisted cluster-maintenance contract: build + append(s) equal a
  * one-shot clustering of the grown corpus, appends move only touched
  * clusters, crashed appends are invisible, and the merge algebra holds
  * on the adversarial corners (cross-boundary duplicates, cluster
  * bridging, singleton adoption, unshingleable docs). */
class ClusterIndexSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    val rows = docs.map { case (id, t) =>
      Row(id, t, "en", "fixture", t.length.toLong)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), docSchema)
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def fullClustering(dir: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.jaccardPairsOf(
          graft.sources.Tables.documents(spark, dir)
            .select(col("doc_id"), col("lang"),
              org.apache.spark.sql.functions.trim(col("text")).as("t")))
        .select(col("a_id"), col("b_id")))

  // ---- the adversarial-corner corpus ---------------------------------
  // Clusters by construction (threshold 0.5, word-3-gram jaccard):
  //   A: 1,2 near-dup; delta 3 identical to 1 (cross-boundary duplicate)
  //   B: base pairs (10,11) and (20,21) share an 8-token core S but sit
  //      at jaccard 6/16 = 0.375 (separate base components); the delta
  //      doc 12 = S alone hits 6/11 = 0.545 against ALL FOUR → one
  //      merged component. (A single doc can't bridge two DISSIMILAR
  //      clusters at 0.5 — |X∩A|,|X∩B| ≥ (|X|+|·|)/3 are disjoint
  //      subsets of X, forcing |A|+|B| ≤ |X| and the seam grams break
  //      the equality case — so the sub-threshold-core shape is the
  //      realistic merge trigger: boilerplate shared across families.)
  //   C: base singleton 30 adopted by delta doc 31 (first-time pairer)
  //   D: 40 and delta 41 are 2-token texts (no 3-gram — never pair)
  //   E: delta-only pair 50,51; delta-only duplicate content 52 == 51
  private val aBase = "alpha beta gamma delta epsilon zeta eta theta"
  private val aVar = "alpha beta gamma delta epsilon zeta eta iota"
  private val core = "the quick brown fox jumps over lazy dogs"
  private val b1 = s"$core apple banana cherry date egg"
  private val b1v = s"$core apple banana cherry date fig"
  private val b2 = s"$core red green blue white black"
  private val b2v = s"$core red green blue white gray"
  private val cBase = "lonely words that sit quietly in a corner here"
  private val cVar = "lonely words that sit quietly in a corner there"
  private val tiny = "two tokens"
  private val e1 = "mercury venus earth mars jupiter saturn uranus neptune"
  private val e1v = "mercury venus earth mars jupiter saturn uranus pluto"

  private def corpusDirs(): (String, String) = {
    val root = Files.createTempDirectory("graft-clusteridx").toString
    val baseDocs = Seq[(Long, String)](
      1L -> aBase, 2L -> aVar,
      10L -> b1, 11L -> b1v, 20L -> b2, 21L -> b2v,
      30L -> cBase, 40L -> tiny)
    val deltaDocs = Seq[(Long, String)](
      3L -> aBase, // identical content across the boundary
      12L -> core, // the sub-threshold-core bridge
      31L -> cVar,
      41L -> tiny,
      50L -> e1, 51L -> e1v, 52L -> e1v)
    val baseDir = s"$root/base"; val fullDir = s"$root/full"
    writeDocs(baseDir, baseDocs)
    writeDocs(fullDir, baseDocs ++ deltaDocs)
    (baseDir, fullDir)
  }

  test("build + append == one-shot clustering of the grown corpus") {
    val (baseDir, fullDir) = corpusDirs()
    val idx = s"${Files.createTempDirectory("graft-ci-eq")}/idx"
    ClusterIndex.build(spark, baseDir, idx)
    val baseMembers = rows(ClusterIndex.members(spark, idx))
    assert(baseMembers === rows(fullClustering(baseDir)),
      "gen0 must be the one-shot clustering of the base corpus")

    ClusterIndex.append(spark, fullDir, idx)
    val merged = rows(ClusterIndex.members(spark, idx))
    assert(merged === rows(fullClustering(fullDir)),
      "append must land exactly the one-shot clustering of the full corpus")

    // corner assertions, by construction:
    val m = ClusterIndex.members(spark, idx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(3L) == m(1L), "cross-boundary duplicate must join its cluster")
    assert(m(10L) == m(20L) && m(12L) == m(10L),
      "the delta bridge must merge both base clusters")
    assert(m(10L) == 10L, "merged label must be the global min id")
    assert(m(31L) == m(30L) && m(30L) == 30L,
      "a base singleton adopted by the delta joins at its own min")
    assert(!m.contains(40L) && !m.contains(41L),
      "sub-3-token docs never pair — identical or not")
    assert(m(51L) == m(50L) && m(52L) == m(50L) && m(50L) == 50L,
      "delta-only pairs and duplicates cluster among themselves")

    // untouched-cluster discipline: gen1 must NOT rewrite cluster E…
    // (E is delta-born so it IS in gen1) — check the A cluster's base
    // rows (1,2) are absent from gen1/members (their label 1 is stable)
    val gen1 = spark.read.parquet(s"$idx/gen1/members")
      .collect().map(_.getLong(0)).toSet
    assert(!gen1.contains(1L) && !gen1.contains(2L),
      "append rewrote members of an untouched cluster")
    // …while doc 3 (new) and 30/31 (label unchanged but 31 new) appear
    assert(gen1.contains(3L) && gen1.contains(31L))
  }

  test("no-op append, crashed append invisibility, and compact") {
    val (baseDir, fullDir) = corpusDirs()
    val idx = s"${Files.createTempDirectory("graft-ci-crash")}/idx"
    ClusterIndex.build(spark, baseDir, idx)
    val baseMembers = rows(ClusterIndex.members(spark, idx))

    // no-op: nothing uncovered → no gen1, members unchanged
    ClusterIndex.append(spark, baseDir, idx)
    assert(!new java.io.File(s"$idx/gen1").exists())
    assert(rows(ClusterIndex.members(spark, idx)) === baseMembers)

    // real append, then roll the manifest back to simulate a crash
    // before the swap: gen1 exists but must be INVISIBLE
    val manPath = java.nio.file.Paths.get(s"$idx/_CLUSTER_MANIFEST.json")
    val preManifest = java.nio.file.Files.readAllBytes(manPath)
    ClusterIndex.append(spark, fullDir, idx)
    val full = rows(ClusterIndex.members(spark, idx))
    java.nio.file.Files.write(manPath, preManifest)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$idx/._CLUSTER_MANIFEST.json.crc"))
    assert(rows(ClusterIndex.members(spark, idx)) === baseMembers,
      "an uncommitted generation leaked into the committed view")
    // the next append deletes the orphan and recommits
    ClusterIndex.append(spark, fullDir, idx)
    assert(rows(ClusterIndex.members(spark, idx)) === full)

    // compact folds gens to one with identical membership
    ClusterIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/gen1").exists())
    assert(new java.io.File(s"$idx/gen0").isDirectory)
    assert(rows(ClusterIndex.members(spark, idx)) === full)
    // and a further append still works against the compacted artifact
    ClusterIndex.append(spark, fullDir, idx)
    assert(rows(ClusterIndex.members(spark, idx)) === full)
  }

  test("dedup_clusters_incremental == dedup_clusters_exact on the fixture") {
    // the in-session twin of build+append (same mergeDelta), pinned
    // here against the one-shot query; the CORRECTNESS row pins it
    // against DuckDB's recursive-CTE closure
    assert(rows(Dedup.dedupClustersIncremental(spark, sf)) ===
      rows(Dedup.dedupClustersExact(spark, sf)))
  }
}
