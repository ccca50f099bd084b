package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** SURVEY.md §2D — similarity search over the embedding column.
  *
  * `ann_cosine_topk` is the exact baseline: query-set × corpus with the
  * codegen'd CosineSim kernel (the small side is broadcast, so the corpus
  * is scanned once, embarrassingly parallel — the correct brute-force
  * shape even at scale when the query set is small).
  *
  * `ann_lsh` is the hash scale path: L independent random-hyperplane
  * tables bucket both sides; a pair is a candidate if it collides in ANY
  * table (OR over tables — recall 1-(1-p^bits)^L per neighbor), and only
  * candidates are exactly rescored. Candidate generation joins carry IDS
  * ONLY; embeddings are re-attached to the deduped candidate set, so the
  * wide vectors never ride the multiplied bucket shuffle.
  *
  * `ann_ivf` is the partition scale path: corpus assigned to C centroid
  * cells, queries probe their nprobe nearest cells, exact cosine only
  * inside probed cells — O(n·nprobe/C) per query, recall tunable by
  * nprobe (spec-pinned ≥ 0.8 at nprobe=12/C=16 on the fixture).
  */
object Ann {

  private[pipeline] val K = 10
  private[pipeline] val Dim = 64

  /** Packed `bits`-bit random-hyperplane signature of vector column `v`:
    * bit b = sign(dot(v, plane_b)). Planes are deterministic pseudo-
    * hyperplanes from splitmix64; `seed` decorrelates tables. Declarative
    * composition kept as the cross-check twin of the fused
    * `hyperplane_buckets` expression (spec asserts bit-identity) — the
    * hot path uses the expression, whose single scalar loop avoids the
    * ~4k-literal plane tree this form hands to codegen. */
  private[pipeline] def hyperplaneBucket(v: Column, bits: Int, dim: Int,
      seed: Long = 0L): Column = {
    val planes: Seq[Seq[Double]] = (0 until bits).map { b =>
      (0 until dim).map { j =>
        splitmix64(seed * 0x10000L + b.toLong * 1024 + j)
          .toDouble / Long.MaxValue
      }
    }
    val planeLits = array(planes.map(p => array(p.map(lit): _*)): _*)
    aggregate(
      zip_with(planeLits, sequence(lit(0), lit(bits - 1)), (plane, b) =>
        when(aggregate(zip_with(v, plane, (x, p) => x * p),
          lit(0.0), (acc, x) => acc + x) > 0, pow(lit(2.0), b).cast("long"))
          .otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Queries = vec_id < 20; ranks by cosine desc with id tiebreak. The
    * similarity itself is excluded from the compared output (float kernels
    * differ across engines); ranks are exact. */
  def annCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val cand = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    broadcast(q).join(cand, col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }

  val annCosineTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_v FROM embeddings WHERE vec_id < 20),
       |scored AS (
       |  SELECT query_id, e.vec_id AS cand_id,
       |    list_cosine_similarity(q_v, e.embedding) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
       |SELECT query_id, cand_id, rank FROM (
       |  SELECT query_id, cand_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS BIGINT) AS rank
       |  FROM scored) t WHERE rank <= $K""".stripMargin

  /** Multi-table LSH ANN: `tables` independent `bits`-bit hyperplane
    * tables, candidates = pairs colliding in any table (deduped), exact
    * top-k among candidates. The bucket join ships only
    * (table, bucket, id) — 16 bytes/row/table — and the 256-byte vectors
    * are attached once to the deduped candidate set. Rows-only check;
    * recall floor spec-pinned against brute force.
    *
    * Defaults (4 bits × 16 tables; measured recall 0.90 on the fixture,
    * spec floor 0.8) are tuned for the fixture's weak similarity
    * structure (top-10 neighbors at cos 0.24-0.49, i.e. ~70° — near the
    * hyperplane-LSH breakeven); corpora with genuine near-dup tails
    * (cos ≥ 0.8) sustain far more bits per table and proportionally
    * smaller buckets at the same recall. */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    annLshTables(spark, dir, bits = 4, tables = 16)

  def annLshTables(spark: SparkSession, dir: String,
      bits: Int, tables: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val banded = e
      .select(col("vec_id"),
        posexplode(hyperplane_buckets(col("embedding"), bits, tables)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
    val qb = banded.filter(col("vec_id") < 20)
      .select(col("tbl"), col("bucket"), col("vec_id").as("query_id"))
    val cb = banded
      .select(col("tbl"), col("bucket"), col("vec_id").as("cand_id"))
    val cand = qb.join(cb, Seq("tbl", "bucket"))
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
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }

  /** Rank-`rank` nearest centroids per vector (broadcast the tiny
    * centroid table; the corpus never shuffles for assignment — see the
    * rank-1 path). Ties break toward the lowest cid, both paths.
    *
    * rank = 1 (the hot path: every corpus-side assignment) is an argmax,
    * expressed as max_by over the scored crossJoin: partial aggregation
    * combines map-side, so the exchange carries n rows, not the n×C a
    * row_number window would sort and shuffle. rank > 1 (query-side
    * probes only — a small fraction of rows) keeps the window form. */
  private[pipeline] def nearestCell(points: DataFrame, cents: DataFrame, rank: Int): DataFrame = {
    val scored = points.crossJoin(broadcast(cents))
      .withColumn("sim", cosine_sim(col("embedding"), col("centroid")))
    if (rank == 1) {
      val others = points.columns.filterNot(_ == "vec_id")
      scored.groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
          others.toIndexedSeq.map(c => any_value(col(c)).as(c)): _*)
        .select((Seq("vec_id") ++ others :+ "cid").map(col): _*)
    } else {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("sim").desc, col("cid").asc)
      scored
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= rank)
        .drop("centroid", "sim", "crank")
    }
  }

  // An IVF coarse quantizer is an INDEX artifact: built once, reused by
  // every search/blocking pass over the same corpus (FAISS persists it;
  // the reference persists its EJDB indexes the same way). Memoize the
  // driver-side centroid rows per (corpus files, C) so one session's
  // queries share one build instead of re-training per query. Keyed by
  // the scan's file set — any rewrite of the corpus changes the key.
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Array[Row]]()

  /** Introspection for AnnIndexSpec's zero-training-on-read proof: a
    * search over a persisted index must leave both training caches
    * untouched (any retraining would repopulate them). */
  private[pipeline] def trainedCacheSizes: (Int, Int) =
    (centroidCache.size, pqCache.size)
  private[pipeline] def clearTrainedCaches(): Unit = {
    centroidCache.clear(); pqCache.clear()
  }

  /** IVF coarse quantizer: sample-trained centroids (buildCentroids) as
    * a C-row LocalRelation, cached per (corpus files, C). */
  private[pipeline] def ivfCentroids(e: DataFrame, c: Int): DataFrame = {
    val files = e.inputFiles
    val rows =
      if (files.nonEmpty)
        centroidCache.computeIfAbsent((files.sorted.mkString(","), c),
          _ => buildCentroids(e, c))
      else buildCentroids(e, c) // in-memory corpora (tests): no stable key
    e.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), centroidSchema)
  }

  private val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("centroid",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))

  /** Quantizer training: C seed centroids (the sample's lowest vec_ids —
    * deterministic) + one Lloyd refinement, computed ON THE DRIVER over a
    * size-bounded deterministic sample — the FAISS/MLlib pattern: k-means
    * training is a max(16384, 256·C)-point problem regardless of corpus
    * size, so sampling to one node is the 100 TB shape (only ASSIGNMENT
    * is distributed — nearestCell above). Driver math also sums each
    * cell in a fixed order, so centroids are bit-deterministic where the
    * old 64-column distributed agg depended on partition order. */
  /** Deterministic size-bounded training sample, collected to the driver
    * (the FAISS/MLlib quantizer-training pattern: training is a bounded
    * problem regardless of corpus size; only assignment is distributed).
    * Keyed by a multiplicative hash of vec_id so it is repartition- and
    * rerun-stable. */
  private def samplePoints(e: DataFrame, target: Long): Array[(Long, Array[Float])] = {
    val n = e.count()
    val sampled =
      if (n <= target) e
      else e.filter(pmod(col("vec_id") * 2654435761L, lit(1L << 20)) <
        lit(((1L << 20) * target + n - 1) / n))
    sampled.select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
  }

  private def buildCentroids(e: DataFrame, c: Int): Array[Row] = {
    val pts = samplePoints(e, math.max(16384L, 256L * c))
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val seeds = pts.take(c) // lowest vec_ids in the sample
    val dim = if (pts.nonEmpty) pts(0)._2.length else Dim
    val sums = Array.fill(c)(new Array[Double](dim))
    val counts = new Array[Long](c)
    for ((_, v) <- pts) {
      var best = 0; var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < seeds.length) { // ascending cid: strict > keeps lowest on ties
        val s = cosine(v, seeds(j)._2)
        if (s > bestSim) { bestSim = s; best = j }
        j += 1
      }
      counts(best) += 1
      var i = 0
      while (i < dim) { sums(best)(i) += v(i); i += 1 }
    }
    seeds.indices.filter(counts(_) > 0).map { j =>
      Row(seeds(j)._1,
        (0 until dim).map(i => (sums(j)(i) / counts(j)).toFloat))
    }.toArray
  }

  /** Multi-probe cell assignment: each vector lands in its `nprobe`
    * nearest cells. Shared by the IVF search path (query-side probes)
    * and the embedding near-dup blocker. */
  private[pipeline] def ivfCells(e: DataFrame, c: Int, nprobe: Int): DataFrame =
    nearestCell(e, ivfCentroids(e, c), nprobe)

  /** IVF (inverted-file) ANN — the partition scale path: corpus in C
    * centroid cells, per query exact cosine only inside the nprobe
    * nearest cells. Search cost O(n·nprobe/C) per query; recall is the
    * nprobe dial (spec floor 0.8 at 12/16 on the fixture's weakly
    * clustered vectors; tighter corpora reach it at far lower nprobe).
    * Rows-only (recall spec-checked against brute force). */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val c = 16
    val nprobe = 12
    val e = Tables.embeddings(spark, dir)
    val refined = ivfCentroids(e, c)
    val cells = nearestCell(e, refined, 1)
      .select(col("cid").as("cell"), col("vec_id").as("cand_id"), col("embedding").as("c_v"))
    val probes = nearestCell(
        e.filter(col("vec_id") < 20).select(col("vec_id"), col("embedding")),
        refined, nprobe)
      .select(col("cid").as("cell"), col("vec_id").as("query_id"), col("embedding").as("q_v"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"))
      .distinct()
  }

  // PQ codebooks are an index artifact like the IVF quantizer: trained
  // once per (corpus, m, ksub) on a driver-side sample, reused by every
  // encode/search over the same files.
  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Array[Float]]()

  private[pipeline] def pqCodebooks(e: DataFrame, m: Int, ksub: Int): Array[Float] = {
    val files = e.inputFiles
    if (files.nonEmpty)
      pqCache.computeIfAbsent((files.sorted.mkString(","), m, ksub),
        _ => pqTrain(e, m, ksub))
    else pqTrain(e, m, ksub)
  }

  /** Sub-quantizer training: per subspace, ksub seeds (the sample's
    * lowest vec_ids — deterministic) + 3 Lloyd rounds of squared-L2
    * k-means over the NORMALIZED sample, all driver math in a fixed
    * order (bit-deterministic). Output layout:
    * flat[(subspace·ksub + centroid)·subdim + i]. */
  private def pqTrain(e: DataFrame, m: Int, ksub: Int): Array[Float] = {
    val pts = samplePoints(e, math.max(16384L, 256L * ksub)).map(_._2)
    require(pts.nonEmpty, "pq training needs a non-empty corpus")
    val dim = pts(0).length
    val sub = dim / m
    val normed = pts.map { v =>
      var nrm = 0.0; var i = 0
      while (i < dim) { nrm += v(i).toDouble * v(i); i += 1 }
      val inv = if (nrm == 0.0) 0.0 else 1.0 / math.sqrt(nrm)
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = (v(i) * inv).toFloat; i += 1 }
      out
    }
    val flat = new Array[Float](m * ksub * sub)
    var j = 0
    while (j < m) {
      val base = j * sub
      var cents = normed.take(ksub).map(v =>
        java.util.Arrays.copyOfRange(v, base, base + sub))
      var round = 0
      while (round < 3) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        for (v <- normed) {
          var best = 0; var bestD = Double.MaxValue
          var cc = 0
          while (cc < cents.length) { // strict <: lowest centroid wins ties
            var dist = 0.0; var t = 0
            while (t < sub) {
              val diff = v(base + t) - cents(cc)(t); dist += diff * diff; t += 1
            }
            if (dist < bestD) { bestD = dist; best = cc }
            cc += 1
          }
          counts(best) += 1
          var t = 0
          while (t < sub) { sums(best)(t) += v(base + t); t += 1 }
        }
        cents = cents.indices.map { ci =>
          if (counts(ci) == 0) cents(ci) // empty cell keeps its seed
          else (0 until sub).map(t => (sums(ci)(t) / counts(ci)).toFloat).toArray
        }.toArray
        round += 1
      }
      var cc = 0
      while (cc < cents.length) {
        System.arraycopy(cents(cc), 0, flat, (j * ksub + cc) * sub, sub)
        cc += 1
      }
      j += 1
    }
    flat
  }

  /** Product-quantization ANN — the memory scale path: the scanned index
    * is m BYTES per vector (m=16 on the fixture → 16× smaller than the
    * raw floats; a 100 TB embedding corpus becomes a ~6 TB scan), queries
    * broadcast a per-query ADC lookup table, and the codegen'd PqAdcDist
    * kernel turns each corpus visit into m table lookups.
    * Top-`rescoreDepth` ADC candidates (ids only — vectors never ride
    * the candidate shuffle) are exactly rescored with CosineSim.
    * Rows-only; recall floor spec-pinned against brute force. m=16
    * (4-dim subspaces) is tuned for the fixture's weak similarity
    * structure — same caveat as annLsh: corpora with genuine near-dup
    * tails sustain m=8 at the same recall. */
  def annPq(spark: SparkSession, dir: String): DataFrame =
    // rescoreDepth 128: at the bench corpus (sf0.1) depth 64 left recall
    // at 0.79 — true neighbors fall below the ADC shortlist as the
    // corpus grows. The rescore is over depth rows PER QUERY (the ADC
    // scan dominates and is depth-independent), so doubling the depth
    // buys recall 0.91 for noise-level cost. bench_recall.json tracks it.
    annPqTuned(spark, dir, m = 16, ksub = 16, rescoreDepth = 128)

  def annPqTuned(spark: SparkSession, dir: String,
      m: Int, ksub: Int, rescoreDepth: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cb = float_array_lit(pqCodebooks(e, m, ksub))
    val codes = e.select(col("vec_id").as("cand_id"),
      pq_encode(col("embedding"), cb, m, ksub).as("codes"))
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
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }

  /** Radius (range) similarity search: ALL candidates within cosine ≥ τ
    * of each query, not a fixed top-k — the primitive behind
    * semantic-dedup sweeps and near-duplicate audits where the neighbor
    * count is data-dependent. Same shape as the brute-force baseline
    * (small query set broadcast, corpus scanned once through the codegen
    * CosineSim kernel); the sub-linear scale path is the IVF/LSH
    * blocking above feeding the same τ filter. τ = 0.3 sits ≥1e-4 from
    * every pair's cosine at the oracle SFs, so the float-kernel gap
    * between engines (~1e-7) cannot flip membership; the compared output
    * carries ids only, never the float. */
  def annRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val Tau = 0.3
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val cand = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_v"))
    broadcast(q).join(cand, col("query_id") =!= col("cand_id"))
      .filter(cosine_sim(col("q_v"), col("c_v")) >= lit(Tau))
      .select(col("query_id"), col("cand_id"))
  }

  val annRangeSearchSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS q_v FROM embeddings WHERE vec_id < 20)
      |SELECT query_id, e.vec_id AS cand_id
      |FROM q JOIN embeddings e ON e.vec_id <> q.query_id
      |WHERE list_cosine_similarity(q_v, e.embedding) >= 0.3""".stripMargin

  /** Hybrid (filtered) vector search — top-k cosine restricted to
    * candidates passing an attribute predicate (here `label % 4 = 1`,
    * standing in for any metadata filter): the "vector search + WHERE
    * clause" surface every vector store names first-class.
    *
    * Strategy is PRE-filter: the predicate is applied before scoring, so
    * it reaches the parquet scan as a pushed filter and the kernel only
    * scores |filtered| vectors — exact recall by construction, and the
    * right shape whenever the filter is selective. (Post-filtering an
    * unfiltered ANN result under-returns: the top-k among ALL vectors
    * may contain < k survivors. For UNselective filters at scale the
    * same predicate composes inside `annIvf`'s probe instead — the
    * blocking changes, the filter semantics don't.) */
  def annFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val cand = e.filter(col("label") % 4 === 1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    broadcast(q).join(cand, col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }

  val annFilteredTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_v FROM embeddings WHERE vec_id < 20),
       |scored AS (
       |  SELECT query_id, e.vec_id AS cand_id,
       |    list_cosine_similarity(q_v, e.embedding) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id AND e.label % 4 = 1)
       |SELECT query_id, cand_id, rank FROM (
       |  SELECT query_id, cand_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS BIGINT) AS rank
       |  FROM scored) t WHERE rank <= $K""".stripMargin

  /** Per-vector nearest-centroid assignment WITH the winning similarity
    * (the rank-1 argmax keeping its score): one broadcast of the C-row
    * centroid table, one map-side-combinable aggregation on vec_id —
    * the corpus never shuffles by cluster. Shared by the k-means stats
    * and cluster-balanced sample below. */
  private def assignWithSim(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("sim", cosine_sim(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("cid"),
        max(col("sim")).as("sim"),
        any_value(col("label")).as("label"))

  /** K-MEANS CLUSTERING as a first-class corpus operator (the
    * cluster-then-curate primitive behind SemDeDup-style pipelines):
    * sample-trained spherical centroids (the cached IVF quantizer —
    * training is a bounded driver problem at ANY corpus size), then one
    * distributed assignment pass and per-cluster structure stats —
    * size, cohesion (mean cosine to own centroid), dominant label and
    * its purity. Plan: one corpus scan, the vec_id argmax aggregation,
    * then a C-row rollup — no shuffle ever carries the embedding
    * vectors beyond the first partial aggregate. Rows-only (centroids
    * are not derivable in SQL); the assignment's argmax correctness and
    * determinism are spec-pinned (KmeansSpec). */
  def embKmeans(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val assigned = assignWithSim(e, ivfCentroids(e, 16))
    val labelCounts = assigned.groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("n"), sum(col("sim")).as("sim_sum"))
    labelCounts.groupBy(col("cid"))
      .agg(sum(col("n")).as("n_vecs"),
        (sum(col("sim_sum")) / sum(col("n"))).as("cohesion"),
        max_by(col("label"), struct(col("n"), -col("label"))).as("top_label"),
        (max(struct(col("n"), -col("label"))).getField("n") / sum(col("n")))
          .as("top_label_share"))
      .select(col("cid"), col("n_vecs"), col("cohesion"),
        col("top_label").cast("long").as("top_label"), col("top_label_share"))
  }

  /** CLUSTER-BALANCED DIVERSITY SAMPLE: k vectors per k-means cluster,
    * chosen by decorrelated hash (deterministic "reservoir" semantics —
    * repartition/rerun stable), so a curation pass keeps coverage of
    * every embedding-space region instead of letting dominant clusters
    * crowd out the tail — the diversity twin of frequency-weighted
    * sampling. The per-cluster pick rides the exact mergeable
    * `bottom_k_sample` aggregate: each map partition ships ≤ k 16-byte
    * pairs per cluster into ONE shuffle; no cluster is ever sorted. */
  def pipelineClusterSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val e = Tables.embeddings(spark, dir)
    val assigned = assignWithSim(e, ivfCentroids(e, 16))
      .withColumn("h", Curation.reservoirHash(col("vec_id")))
    val sampled = assigned.groupBy(col("cid"))
      .agg(graft.functions.GraftFunctions
        .bottom_k_sample(col("h"), col("vec_id"), k).as("sample"))
      .select(col("cid"), posexplode(col("sample")).as(Seq("r0", "e")))
      .select(col("cid"), col("e.id").as("vec_id"),
        (col("r0") + 1).cast("long").as("rn"))
    // payload recovery: the ≤ C·k sampled ids broadcast back onto the RAW
    // table (never the reverse — the corpus side is the 100 TB one, and
    // label lives in the scan, so the assignment pass is not re-run)
    Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
      .join(broadcast(sampled), Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("rn"),
        col("label").cast("long").as("label"))
  }

  /** HYBRID retrieval — reciprocal-rank fusion of a lexical arm and a
    * vector arm, the shape every modern RAG/search stack serves ("BM25 +
    * embeddings, fused"). Arms: the BM25 top-20 over documents
    * (`text_search_bm25`'s scoring, zero data shuffle) and the exact
    * cosine top-20 around a pinned query vector (vec_id 0; broadcast
    * query × one corpus scan through the codegen CosineSim kernel,
    * `ann_cosine_topk`'s shape), fused over the shared doc_id = vec_id
    * key space. RRF score = Σ_arms 1/(60 + rank) over the arms that
    * returned the doc (Cormack et al.'s k=60) — rank-based, so the
    * fusion needs no score normalization across arms. At scale both
    * arms end in TakeOrdered top-k; the fusion is a full-outer join of
    * two ≤20-row sets (driver-free, broadcast-trivial), and the final
    * rank is a window over ≤40 Limit-bounded rows. Cross-engine
    * exactness: ranks are integers, each 1/(60+r) is one IEEE division
    * of small ints rounded to 9dp and summed as DECIMAL(18,9). */
  def annHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val d9 = org.apache.spark.sql.types.DecimalType(18, 9)
    val lexW = Window.orderBy(col("score").desc, col("doc_id").asc)
    val lex = TextOps.textSearchBm25(spark, dir)
      .select(col("doc_id"),
        row_number().over(lexW).cast("long").as("lex_rank"))
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    // single-query top-k: TakeOrderedAndProject (per-partition partial
    // top-20, tiny merge) — a window partitioned on the one query value
    // would funnel the whole corpus through a single task
    val vec = broadcast(q)
      .join(e.select(col("vec_id").as("cand_id"), col("embedding").as("c_v")),
        col("query_id") =!= col("cand_id"))
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine_sim(col("q_v"), col("c_v")))
      .orderBy(col("cos").desc, col("cand_id").asc)
      .limit(20)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("cand_id").asc)).cast("long"))
      .select(col("cand_id").as("doc_id"), col("vec_rank"))
    def rrfTerm(rank: Column): Column =
      when(rank.isNotNull, round(lit(1.0) / (lit(60) + rank), 9))
        .otherwise(lit(0.0)).cast(d9)
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        (rrfTerm(col("lex_rank")) + rrfTerm(col("vec_rank"))).cast("double"))
    fused
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        col("rrf"), col("rank"))
  }

  val annHybridRrfSql: String = {
    val bm25 = TextOps.textSearchBm25Sql
    s"""WITH lex0 AS ($bm25),
       |lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS lex_rank
       |  FROM lex0),
       |q AS (SELECT vec_id AS query_id, embedding AS q_v FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT e.vec_id AS doc_id,
       |    list_cosine_similarity(q_v, e.embedding) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
       |vec AS (
       |  SELECT doc_id, vec_rank FROM (
       |    SELECT doc_id,
       |      CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS vec_rank
       |    FROM scored) t WHERE vec_rank <= 20),
       |fused AS (
       |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
       |    CAST(
       |      (CASE WHEN lex_rank IS NOT NULL
       |         THEN CAST(round(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 9) AS DECIMAL(18,9))
       |         ELSE CAST(0.0 AS DECIMAL(18,9)) END
       |       + CASE WHEN vec_rank IS NOT NULL
       |         THEN CAST(round(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 9) AS DECIMAL(18,9))
       |         ELSE CAST(0.0 AS DECIMAL(18,9)) END) AS DOUBLE) AS rrf
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
       |SELECT doc_id, lex_rank, vec_rank, rrf,
       |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
       |FROM fused""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_filtered_topk" -> (annFilteredTopk _),
    "ann_hybrid_rrf" -> (annHybridRrf _),
    "ann_cosine_topk" -> (annCosineTopk _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
    "ann_pq" -> (annPq _),
    "ann_range_search" -> (annRangeSearch _),
    "emb_kmeans" -> (embKmeans _),
    "pipeline_cluster_sample" -> (pipelineClusterSample _),
  )

  val oracles: Map[String, String] = Map(
    "ann_filtered_topk" -> annFilteredTopkSql,
    "ann_hybrid_rrf" -> annHybridRrfSql,
    "ann_cosine_topk" -> annCosineTopkSql,
    "ann_range_search" -> annRangeSearchSql,
  )
}
