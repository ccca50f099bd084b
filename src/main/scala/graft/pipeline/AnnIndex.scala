package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
  *   ivf_centroids/  (cid, centroid)                 — coarse quantizer
  *   ivf_cells/      cid=<c>/ (vec_id, embedding)    — the inverted file,
  *                   PARTITIONED BY cid: a probe of nprobe cells reads
  *                   only those partitions (partition pruning is the
  *                   whole point of IVF at scale)
  *   pq_codebooks/   (m, ksub, dim, flat)            — one row
  *   pq_codes/       (vec_id, codes)                 — m small ints/vec
  *   lsh_tables/     (tbl, bucket, vec_id)           — L banded tables
  *   _INDEX_MANIFEST.json                            — commit point
  *
  * Publish discipline (the GraftDB/Layout pattern): everything is built
  * under `<indexDir>.build.tmp` with the manifest written LAST inside
  * it, then published by a single directory rename — a crashed build
  * leaves only a tmp dir the next build clears, and a reader either
  * sees a complete manifested index or nothing. Loaders REQUIRE the
  * manifest, and validate both the index params and the corpus
  * fingerprint (sorted source-file list), so an index built from a
  * rewritten corpus can never serve stale ids silently.
  */
object AnnIndex {

  case class Params(c: Int = 16, m: Int = 16, ksub: Int = 16,
      bits: Int = 4, tables: Int = 16)

  private val ManifestName = "_INDEX_MANIFEST.json"
  private val Version = 1

  private def fingerprint(e: DataFrame): String = {
    val files = e.inputFiles.sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(files.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Train + encode + write every index family, publish atomically. */
  def build(spark: SparkSession, corpusDir: String, indexDir: String,
      params: Params = Params()): Unit = {
    import org.apache.hadoop.fs.Path
    val e = Tables.embeddings(spark, corpusDir)
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, p.getName + ".build.tmp")
    fs.delete(tmp, true)

    // IVF: trained centroids + the cid-partitioned inverted file
    val cents = Ann.ivfCentroids(e, params.c)
    cents.write.parquet(s"$tmp/ivf_centroids")
    Ann.nearestCell(e, cents, 1)
      .select(col("cid"), col("vec_id"), col("embedding"))
      .write.partitionBy("cid").parquet(s"$tmp/ivf_cells")

    // PQ: codebooks (one row) + per-vector codes
    val flat = Ann.pqCodebooks(e, params.m, params.ksub)
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
    e.select(col("vec_id"),
        pq_encode(col("embedding"), float_array_lit(flat), params.m, params.ksub).as("codes"))
      .write.parquet(s"$tmp/pq_codes")

    // LSH: the L banded tables
    e.select(col("vec_id"),
        posexplode(hyperplane_buckets(col("embedding"), params.bits, params.tables)))
      .select(col("pos").as("tbl"), col("col").as("bucket"), col("vec_id"))
      .write.parquet(s"$tmp/lsh_tables")

    // manifest LAST inside tmp — the commit point travels with the data
    val manifest =
      s"""{"version":$Version,"corpus_fingerprint":"${fingerprint(e)}",""" +
      s""""c":${params.c},"m":${params.m},"ksub":${params.ksub},""" +
      s""""bits":${params.bits},"tables":${params.tables}}"""
    val out = fs.create(new Path(tmp, ManifestName), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()

    // two-rename publish (the Layout.compactSmallFiles pattern): a
    // crash never leaves ZERO committed indexes on disk — between the
    // renames the old index lives at `.old`, and the next build (or
    // loadSelfHeal below) restores it before doing anything else.
    // delete-then-rename would have a window where the only complete
    // index is the unpublished tmp the next build's first act deletes.
    val oldP = new Path(p.getParent, p.getName + ".old")
    fs.delete(oldP, true)
    if (fs.exists(p) && !fs.rename(p, oldP))
      throw new java.io.IOException(s"annindex: cannot retire $p")
    if (!fs.rename(tmp, p)) {
      fs.rename(oldP, p) // roll back — previous index untouched
      throw new java.io.IOException(s"annindex: cannot publish $tmp -> $p")
    }
    fs.delete(oldP, true)
  }

  /** Restore an index a crashed build left retired at `.old` (crash
    * between the publish renames). Called by every loader. */
  private def selfHeal(spark: SparkSession, indexDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new Path(p.getParent, p.getName + ".old")
    if (!fs.exists(p) && fs.exists(oldP)) {
      if (!fs.rename(oldP, p))
        throw new java.io.IOException(s"annindex: cannot restore $oldP")
    }
  }

  private def readManifest(spark: SparkSession, indexDir: String): Map[String, String] = {
    import org.apache.hadoop.fs.Path
    selfHeal(spark, indexDir)
    val mp = new Path(indexDir, ManifestName)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(mp),
      s"$indexDir has no $ManifestName — not a committed index (crashed build?)")
    val in = fs.open(mp)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    "\"([a-z_]+)\":\"?([0-9a-f]+)\"?".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Validate the manifest against the serving corpus + expected params.
    * Corpus check is strict: ids in the index are positions in THAT
    * corpus; serving a rewritten corpus from a stale index is the silent
    * failure mode this exists to prevent. */
  private def validate(spark: SparkSession, corpusDir: String,
      indexDir: String, expect: Map[String, Int]): Unit = {
    val m = readManifest(spark, indexDir)
    val fp = fingerprint(Tables.embeddings(spark, corpusDir))
    require(m.get("corpus_fingerprint").contains(fp),
      s"index $indexDir was built from a different corpus than $corpusDir")
    expect.foreach { case (k, v) =>
      require(m.get(k).contains(v.toString),
        s"index $indexDir has $k=${m.getOrElse(k, "?")}, search expects $v")
    }
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
    validate(spark, corpusDir, indexDir, Map("c" -> c))
    val cents = spark.read.parquet(s"$indexDir/ivf_centroids")
    val cells = spark.read.parquet(s"$indexDir/ivf_cells")
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
    validate(spark, corpusDir, indexDir, Map("m" -> m, "ksub" -> ksub))
    val cbRow = spark.read.parquet(s"$indexDir/pq_codebooks").head()
    val flat = cbRow.getSeq[Float](cbRow.fieldIndex("flat")).toArray
    val cb = float_array_lit(flat)
    val codes = spark.read.parquet(s"$indexDir/pq_codes")
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
    validate(spark, corpusDir, indexDir, Map("bits" -> bits, "tables" -> tables))
    val cb = spark.read.parquet(s"$indexDir/lsh_tables")
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
