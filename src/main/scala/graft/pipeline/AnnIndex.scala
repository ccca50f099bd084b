package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.hadoop.fs.{FileSystem, Path}
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Persisted ANN index artifacts — the serving layout the reference's
  * index-node role implies (it persists its EJDB indexes beside the doc
  * store; FAISS persists trained quantizers the same way) and every
  * 100 TB deployment needs: training is a once-per-corpus job whose
  * output is TABLES, and the search path reads those tables with ZERO
  * training work. In-session, Ann memoizes the trained quantizers per
  * (corpus, params); this module makes that artifact durable across
  * sessions and shareable across a cluster.
  *
  * Layout under `indexDir` (all parquet):
  *   ivf_centroids/   (cid, centroid)                — coarse quantizer
  *   pq_codebooks/    (m, ksub, dim, flat)           — one row
  *   gen<N>/ivf_cells/ cid=<c>/ (vec_id, embedding)  — the inverted
  *                    file, PARTITIONED BY cid: a probe of nprobe cells
  *                    reads only those partitions (partition pruning is
  *                    the whole point of IVF at scale)
  *   gen<N>/pq_codes/  (vec_id, codes)               — m small ints/vec
  *   gen<N>/lsh_tables/ (tbl, bucket, vec_id)        — L banded tables
  *   _INDEX_MANIFEST.json                            — commit point
  *
  * GENERATIONS are the incremental-ingestion story (the FAISS
  * train-once/add-many pattern, closing the loop with
  * `dedup_incremental`): `build` writes gen0; each `append` assigns the
  * corpus's NEW vectors to the EXISTING centroids/codebooks — no
  * retrain, no rewrite of earlier gens — and publishes them as the next
  * gen. The manifest's `gens` count is the reader's source of truth: a
  * gen directory the manifest doesn't cover is invisible (a crashed
  * append's orphan, deleted and rebuilt by the next append).
  *
  * Publish discipline (the GraftDB/Layout pattern): `build` stages
  * everything under `<indexDir>.build.tmp` with the manifest written
  * LAST inside it, then publishes by renames (retire live to `.old`,
  * rename tmp in, drop `.old`) — and FIRST self-heals a `.old` a prior
  * crashed build left retired, so no crash window ever leaves zero
  * committed indexes. `append` stages its gen under `gen<N>.tmp`,
  * renames it in place (still invisible), then swaps the manifest via
  * `.new` + rename (self-healed by every loader). Loaders REQUIRE the
  * manifest and validate both the index params and the corpus
  * fingerprint — file paths PLUS length and mtime, so a corpus
  * rewritten in place under the same names invalidates the index
  * instead of silently serving wrong vec_ids. */
object AnnIndex {

  case class Params(c: Int = 16, m: Int = 16, ksub: Int = 16,
      bits: Int = 4, tables: Int = 16)

  private val ManifestName = "_INDEX_MANIFEST.json"
  private val Version = 2

  /** Corpus identity: per-file (path, length, mtime) — not names alone,
    * so a same-name in-place rewrite (rsync, manual copy, non-Spark
    * writer) invalidates dependent indexes. */
  private def fingerprint(spark: SparkSession, e: DataFrame): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val lines = e.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f|${st.getLen}|${st.getModificationTime}"
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(lines.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def manifestJson(fp: String, params: Params, gens: Int): String =
    s"""{"version":$Version,"corpus_fingerprint":"$fp",""" +
    s""""c":${params.c},"m":${params.m},"ksub":${params.ksub},""" +
    s""""bits":${params.bits},"tables":${params.tables},"gens":$gens}"""

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    ArtifactIo.fsOf(spark, p)

  /** Stage one generation's encodings under `genTmp`: assignment to the
    * FIXED centroids, PQ codes from the FIXED codebooks, LSH bands (the
    * hyperplanes are deterministic functions of (bits, tables)). Shared
    * verbatim by build (gen0, freshly trained quantizers) and append
    * (gen N, quantizers read back from the index). */
  private def writeGen(vectors: DataFrame, cents: DataFrame,
      flat: Array[Float], params: Params, genTmp: String): Unit = {
    // three independent encodings of the same vector set — concurrent
    // jobs (the ClusterIndex gen-write pattern): at small deltas each
    // write is fixed-overhead-dominated, so serializing them tripled the
    // append's constant
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    ArtifactIo.awaitAll(Seq(
      Future(Ann.nearestCell(vectors, cents, 1)
        .select(col("cid"), col("vec_id"), col("embedding"))
        .write.partitionBy("cid").parquet(s"$genTmp/ivf_cells")),
      Future(vectors.select(col("vec_id"),
          pq_encode(col("embedding"), float_array_lit(flat),
            params.m, params.ksub).as("codes"))
        .write.parquet(s"$genTmp/pq_codes")),
      Future(vectors.select(col("vec_id"),
          posexplode(hyperplane_buckets(col("embedding"), params.bits, params.tables)))
        .select(col("pos").as("tbl"), col("col").as("bucket"), col("vec_id"))
        .write.parquet(s"$genTmp/lsh_tables"))))
  }

  /** Train + encode + write every index family, publish atomically.
    * `pretrainedFrom` reads centroids + codebooks from another committed
    * index instead of training — the FAISS "train on a sample, add all"
    * pattern, and the equivalence anchor for `append` (a one-shot build
    * with the same quantizers must equal build+append; AnnIndexSpec). */
  def build(spark: SparkSession, corpusDir: String, indexDir: String,
      params: Params = Params(), pretrainedFrom: Option[String] = None): Unit = {
    val e = Tables.embeddings(spark, corpusDir)
    val p = new Path(indexDir)
    val fs = fsOf(spark, p)
    // a prior build may have crashed between its publish renames leaving
    // the only committed index at `.old` — restore it BEFORE this
    // build's own retire step deletes `.old` (else a crash in the
    // window below leaves ZERO committed indexes)
    selfHeal(spark, indexDir)
    val tmp = new Path(p.getParent, p.getName + ".build.tmp")
    fs.delete(tmp, true)

    val (cents, flat) = pretrainedFrom match {
      case Some(src) =>
        val m = readManifest(spark, src)
        val got = Params(m("c").toInt, m("m").toInt, m("ksub").toInt,
          m("bits").toInt, m("tables").toInt)
        require(got == params,
          s"pretrained index $src has params $got, build expects $params")
        (spark.read.parquet(s"$src/ivf_centroids"), readCodebooks(spark, src))
      case None =>
        (Ann.ivfCentroids(e, params.c),
          Ann.pqCodebooks(e, params.m, params.ksub))
    }
    cents.write.parquet(s"$tmp/ivf_centroids")
    val dim = flat.length / (params.m * params.ksub) * params.m
    spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(params.m, params.ksub, dim, flat.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("ksub", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("dim", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("flat",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
      .write.parquet(s"$tmp/pq_codebooks")
    writeGen(e, cents, flat, params, s"$tmp/gen0")

    // manifest LAST inside tmp — the commit point travels with the data
    ArtifactIo.writeText(fs, new Path(tmp, ManifestName),
      manifestJson(fingerprint(spark, e), params, gens = 1))
    // two-rename publish (the Layout.compactSmallFiles pattern) — see
    // ArtifactIo.publish for the crash-window argument
    ArtifactIo.publish(spark, indexDir, tmp)
  }

  /** Incremental ingestion: index the corpus's vectors that no committed
    * generation covers, against the EXISTING quantizers — zero training,
    * zero rewrite of earlier gens. The new generation is staged at
    * `gen<N>.tmp`, renamed into place (still invisible — the manifest
    * doesn't cover it), and committed by the manifest swap, which also
    * advances the corpus fingerprint to the grown corpus. Crash before
    * the swap → an orphan gen dir readers never touch, deleted and
    * rebuilt by the next append; crash mid-swap → healed from
    * `.new` by every loader. At 100 TB this is what makes corpus growth
    * O(delta): the alternative — full rebuild — re-encodes every vector
    * ever ingested. */
  def append(spark: SparkSession, corpusDir: String, indexDir: String,
      params: Params = Params()): Unit = {
    val man = readManifest(spark, indexDir)
    Seq("c" -> params.c, "m" -> params.m, "ksub" -> params.ksub,
        "bits" -> params.bits, "tables" -> params.tables).foreach {
      case (k, v) => require(man.get(k).contains(v.toString),
        s"index $indexDir has $k=${man.getOrElse(k, "?")}, append expects $v")
    }
    val n = man("gens").toInt
    val e = Tables.embeddings(spark, corpusDir)
    // ids-only anti-join finds the uncovered vectors (8 B/row shuffle);
    // persist: three encode jobs below share the delta
    val existing = readAcrossGens(spark, indexDir, n, "pq_codes")
      .select(col("vec_id"))
    val fresh = e.join(existing, Seq("vec_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // full count: no-op probe + cache materialization in ONE job (the
      // three encode jobs below all consume the persisted delta)
      if (fresh.count() == 0L) return // nothing new: no-op
      val p = new Path(indexDir)
      val fs = fsOf(spark, p)
      val genP = new Path(s"$indexDir/gen$n")
      val genTmp = new Path(s"$indexDir/gen$n.tmp")
      fs.delete(genTmp, true)
      fs.delete(genP, true) // a crashed append's orphan — uncommitted garbage
      val cents = spark.read.parquet(s"$indexDir/ivf_centroids")
      writeGen(fresh, cents, readCodebooks(spark, indexDir), params, genTmp.toString)
      if (!fs.rename(genTmp, genP))
        throw new java.io.IOException(s"annindex: cannot stage $genP")
      ArtifactIo.swapManifest(fs, p, ManifestName,
        manifestJson(fingerprint(spark, e), params, gens = n + 1))
    } finally fresh.unpersist()
  }

  /** Fold every committed generation back into a single gen0 — the
    * rollup-compaction story for this artifact (ClusterIndex.compact's
    * twin): each append adds a gen dir, and searches pay a per-gen
    * listing + union until compaction restores the build-fresh shape.
    * Quantizers and the corpus fingerprint are UNCHANGED (compaction
    * moves encodings, it re-derives nothing); the folded cells rewrite
    * under `partitionBy(cid)` so nprobe partition pruning survives.
    * Staged as a full `.build.tmp` and published by the same two-rename
    * discipline as build — a crash anywhere leaves the multi-gen index
    * intact and serving. */
  /** Auto-compaction for the maintenance tick — ClusterIndex
    * .compactIfDue's twin: fold when the committed gen count reaches
    * `maxGens`, so repeated appends hold O(maxGens) gen dirs. Crash
    * mid-compact is harmless (two-rename publish). */
  def compactIfDue(spark: SparkSession, indexDir: String, maxGens: Int = 8): Unit =
    if (readManifest(spark, indexDir)("gens").toInt >= maxGens)
      compact(spark, indexDir)

  def compact(spark: SparkSession, indexDir: String): Unit = {
    val man = readManifest(spark, indexDir)
    val n = man("gens").toInt
    if (n <= 1) return
    val params = Params(man("c").toInt, man("m").toInt, man("ksub").toInt,
      man("bits").toInt, man("tables").toInt)
    val p = new Path(indexDir)
    val fs = fsOf(spark, p)
    val tmp = new Path(p.getParent, p.getName + ".build.tmp")
    fs.delete(tmp, true)
    spark.read.parquet(s"$indexDir/ivf_centroids")
      .write.parquet(s"$tmp/ivf_centroids")
    spark.read.parquet(s"$indexDir/pq_codebooks")
      .write.parquet(s"$tmp/pq_codebooks")
    readAcrossGens(spark, indexDir, n, "ivf_cells")
      .write.partitionBy("cid").parquet(s"$tmp/gen0/ivf_cells")
    readAcrossGens(spark, indexDir, n, "pq_codes")
      .write.parquet(s"$tmp/gen0/pq_codes")
    readAcrossGens(spark, indexDir, n, "lsh_tables")
      .write.parquet(s"$tmp/gen0/lsh_tables")
    ArtifactIo.writeText(fs, new Path(tmp, ManifestName),
      manifestJson(man("corpus_fingerprint"), params, gens = 1))
    ArtifactIo.publish(spark, indexDir, tmp)
  }

  private def readCodebooks(spark: SparkSession, indexDir: String): Array[Float] = {
    val row = spark.read.parquet(s"$indexDir/pq_codebooks").head()
    row.getSeq[Float](row.fieldIndex("flat")).toArray
  }

  /** Union of one artifact across every committed generation. Flat
    * artifacts (pq_codes, lsh_tables) read all gen paths in ONE reader
    * call — per-gen reads pay a listing + schema job each, which at 20
    * gens dominated the append's fixed cost. The `cid=`-partitioned
    * ivf_cells must stay a per-gen union: Spark refuses multiple
    * partition-discovery roots in one read (KD009), and the union keeps
    * per-gen partition pruning for nprobe probes anyway. */
  private def readAcrossGens(spark: SparkSession, indexDir: String,
      gens: Int, sub: String): DataFrame =
    if (sub == "ivf_cells")
      (0 until gens).map(i => spark.read.parquet(s"$indexDir/gen$i/$sub"))
        .reduce(_ unionByName _)
    else
      spark.read.parquet((0 until gens).map(i => s"$indexDir/gen$i/$sub"): _*)

  /** Restore an index a crashed build left retired at `.old` — see
    * [[ArtifactIo.healRetired]]. Called by every loader AND by build
    * itself before it touches `.old`. */
  private def selfHeal(spark: SparkSession, indexDir: String): Unit =
    ArtifactIo.healRetired(spark, indexDir)

  private def readManifest(spark: SparkSession, indexDir: String): Map[String, String] =
    ArtifactIo.readManifest(spark, indexDir, ManifestName, "index")

  /** Validate the manifest against the serving corpus + expected params,
    * returning the manifest (loaders need `gens`). Corpus check is
    * strict: ids in the index are positions in THAT corpus; serving a
    * rewritten corpus from a stale index is the silent failure mode this
    * exists to prevent (the fingerprint covers file length + mtime, so
    * in-place rewrites are caught too). */
  private def validate(spark: SparkSession, corpusDir: String,
      indexDir: String, expect: Map[String, Int]): Map[String, String] = {
    val m = readManifest(spark, indexDir)
    val fp = fingerprint(spark, Tables.embeddings(spark, corpusDir))
    require(m.get("corpus_fingerprint").contains(fp),
      s"index $indexDir was built from a different corpus than $corpusDir")
    expect.foreach { case (k, v) =>
      require(m.get(k).contains(v.toString),
        s"index $indexDir has $k=${m.getOrElse(k, "?")}, search expects $v")
    }
    m
  }

  /** IVF search from the persisted index: centroids and the inverted
    * file are READ, never retrained — the only per-query work is the
    * probe assignment (queries × C broadcast centroids) and exact
    * cosine inside the probed cells. Output-identical to `Ann.annIvf`
    * over the same corpus/params (AnnIndexSpec pins it). */
  def searchIvf(spark: SparkSession, corpusDir: String, indexDir: String,
      nprobe: Int = 12, k: Int = Ann.K, c: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, corpusDir)
    // expected params come from the CALLER (defaults = Ann.annIvf's),
    // never from the manifest itself — reading c out of the manifest
    // and comparing it against the manifest would always pass
    val man = validate(spark, corpusDir, indexDir, Map("c" -> c))
    val cents = spark.read.parquet(s"$indexDir/ivf_centroids")
    val cells = readAcrossGens(spark, indexDir, man("gens").toInt, "ivf_cells")
      .select(col("cid").cast("long").as("cell"),
        col("vec_id").as("cand_id"), col("embedding").as("c_v"))
    val probes = Ann.nearestCell(
        e.filter(col("vec_id") < 20).select(col("vec_id"), col("embedding")),
        cents, nprobe)
      .select(col("cid").as("cell"), col("vec_id").as("query_id"),
        col("embedding").as("q_v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"))
      .distinct()
  }

  /** PQ search from the persisted codes + codebooks: the ADC scan reads
    * m-byte codes instead of raw vectors (the persisted form of the
    * 16× memory win), the codebook row is driver-read once, and only
    * the rescore joins raw embeddings back by candidate id. */
  def searchPq(spark: SparkSession, corpusDir: String, indexDir: String,
      rescoreDepth: Int = 128, k: Int = Ann.K,
      m: Int = 16, ksub: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, corpusDir)
    val man = validate(spark, corpusDir, indexDir, Map("m" -> m, "ksub" -> ksub))
    val cb = float_array_lit(readCodebooks(spark, indexDir))
    val codes = readAcrossGens(spark, indexDir, man("gens").toInt, "pq_codes")
      .select(col("vec_id").as("cand_id"), col("codes"))
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        pq_lut(col("embedding"), cb, m, ksub).as("lut"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("cand_id").asc)
    val cand = broadcast(queries).join(codes, col("query_id") =!= col("cand_id"))
      .withColumn("adc", pq_adc_dist(col("codes"), col("lut")))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= rescoreDepth)
      .select(col("query_id"), col("cand_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    cand
      .join(broadcast(e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("c_v")),
        Seq("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }

  /** LSH search from the persisted tables: the corpus side's banding is
    * READ; only the (tiny) query set is re-hashed — the hyperplanes are
    * deterministic functions of (bits, tables), so fresh query buckets
    * collide with the stored corpus buckets exactly as an in-session
    * banding would. */
  def searchLsh(spark: SparkSession, corpusDir: String, indexDir: String,
      k: Int = Ann.K, bits: Int = 4, tables: Int = 16): DataFrame = {
    val e = Tables.embeddings(spark, corpusDir)
    val man = validate(spark, corpusDir, indexDir,
      Map("bits" -> bits, "tables" -> tables))
    val cb = readAcrossGens(spark, indexDir, man("gens").toInt, "lsh_tables")
      .select(col("tbl"), col("bucket"), col("vec_id").as("cand_id"))
    val qb = e.filter(col("vec_id") < 20)
      .select(col("vec_id"),
        posexplode(hyperplane_buckets(col("embedding"), bits, tables)))
      .select(col("pos").as("tbl"), col("col").as("bucket"),
        col("vec_id").as("query_id"))
    val cand = broadcast(qb).join(cb, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    cand
      .join(broadcast(e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("c_v")),
        Seq("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }
}
