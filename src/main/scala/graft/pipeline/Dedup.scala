package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** SURVEY.md §2D — deduplication operators over `documents` /
  * `embeddings`. Scale shape: every near-dup variant is
  * candidate-generation-by-bucketing (shuffle on a band/bucket key,
  * candidates verified pairwise inside buckets) — never a global O(n²)
  * cross join. The brute-force paths exist only as small-side baselines.
  */
object Dedup {

  /** Word-3-gram shingle set of `text` (deduped) — shared candidate basis. */
  private[pipeline] def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => when(i + n <= size(toks), concat_ws(" ", slice(toks, i + 1, lit(n))))),
      c => c.isNotNull))
  }

  /** Exact dedup: group by content hash, keep the first doc id per group.
    * One shuffle on md5; at 100 TB this is the standard hash-partitioned
    * exact dedup (the hash is the shuffle key, groups never co-load). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))
  }

  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact n-gram Jaccard similarity join: candidate pairs blocked by
    * language (the blocking key stands in for an LSH prefilter at scale),
    * verified with exact set intersection/union. Deterministic double
    * division of exact integers. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Exact set-similarity join via inverted index: explode distinct
    // shingles, join on (lang, shingle) so only pairs sharing content ever
    // materialize, |∩| = co-occurrence count, |∪| = |a|+|b|-|∩|. Same
    // exact result as the naive pairwise form but O(co-occurrences)
    // instead of O(n² · set-size) — the shape that survives 100 TB.
    // join key = distinct 64-bit shingle hashes straight off the token
    // array (no shingle strings ever materialize; collision odds ~1e-10
    // at 1e6 distinct shingles — below the noise floor).
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        shingle_hashes(split(trim(col("text")), "\\s+"), 3).as("ng"))
      .withColumn("sz", size(col("ng")).cast("long"))
    val ex = d.select(col("lang"), col("doc_id"), col("sz"),
      explode(col("ng")).as("sh"))
    val x = ex.select(col("lang"), col("sh"), col("doc_id").as("a_id"), col("sz").as("a_sz"))
    val y = ex.select(col("lang"), col("sh"), col("doc_id").as("b_id"), col("sz").as("b_sz"))
    x.join(y, Seq("lang", "sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_sz"), col("b_sz"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("a_sz") + col("b_sz") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"), col("jaccard"))
  }

  val dedupNgramJaccardSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, greatest(len(string_split(trim(text), ' ')) - 2, 0) + 1),
      |      i -> string_split(trim(text), ' ')[i] || ' ' || string_split(trim(text), ' ')[i+1] || ' ' || string_split(trim(text), ' ')[i+2])) AS ng
      |  FROM documents)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(len(list_intersect(a.ng, b.ng)) AS BIGINT) AS inter,
      |  CAST(len(list_distinct(list_concat(a.ng, b.ng))) AS BIGINT) AS uni,
      |  CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) / len(list_distinct(list_concat(a.ng, b.ng))) AS jaccard
      |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) / len(list_distinct(list_concat(a.ng, b.ng))) >= 0.5""".stripMargin

  /** MinHash + LSH banded near-dup candidates (rows-only check: the
    * signature permutations aren't SQL-expressible in the oracle).
    * 64-perm signature → 16 bands × 4 rows; pairs sharing ≥1 band bucket
    * become candidates; est_jaccard = matching signature fraction.
    * The band bucket is the shuffle key — O(n) with small buckets, the
    * 100 TB path. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val bands = 16
    val rows = 4
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        shingle_minhash(split(trim(col("text")), "\\s+"), 3, bands * rows).as("sig"))
    val banded = d.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .select(col("doc_id"), col("sig"), col("pos").as("band"), col("col").as("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (aggregate(zip_with(col("a_sig"), col("b_sig"),
            (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, m) => acc + m)
          .cast("double") / (bands * rows)).as("est_jaccard"))
      .distinct()
  }

  /** SimHash near-dup: 64-bit fingerprint, banded into 4×16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk), candidates
    * verified by exact hamming distance. Rows-only check. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash64(split(trim(col("text")), "\\s+")).as("sh"))
    val banded = d.select(col("doc_id"), col("sh"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .select(col("doc_id"), col("sh"), col("pos").as("band"), col("col").as("chunk"))
    val l = banded.select(col("band"), col("chunk"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val r = banded.select(col("band"), col("chunk"), col("doc_id").as("b_id"), col("sh").as("b_sh"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** Embedding near-dup: cosine ≥ threshold pairs, blocked by label (the
    * synthetic embeddings are near-orthogonal, so 0.4 captures the true
    * closest-pair tail; real corpora would use ~0.95),
    * stand-in for an ANN-bucket prefilter at scale), verified with the
    * codegen'd CosineSim. Rows-only check (float kernel not reproduced in
    * the oracle). */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("embedding").as("b_v"))
    a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine_sim(col("a_v"), col("b_v")))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"), col("label"), col("cos"))
  }

  /** Near-dup clustering: connected components over the MinHash candidate
    * pair graph via iterative min-label propagation (each round: every
    * node takes the min label among itself and its neighbors; converges
    * in O(component diameter) rounds — near-dup components are tiny, so
    * a fixed small round count suffices; each round is one join+groupBy,
    * fully distributed). Output: (doc_id, cluster) for docs in any
    * near-dup pair. Rows-only; structure spec-checked. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhash(spark, dir)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"))
    // undirected edge list, both directions + self
    // materialize the edge list once — iterative propagation would
    // otherwise re-run the whole MinHash candidate generation per round
    // (on a cluster: checkpoint to reliable storage instead)
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .unionByName(pairs.select(col("a_id").as("src"), col("a_id").as("dst")))
      .unionByName(pairs.select(col("b_id").as("src"), col("b_id").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
    var i = 0
    while (i < 4) {
      labels = edges
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("cluster")).as("cluster"))
        .withColumnRenamed("id2", "id")
      i += 1
    }
    labels.select(col("id").as("doc_id"), col("cluster"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> (dedupClusters _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
  )

  /** dedup_minhash / dedup_simhash / dedup_embedding are rows-only. */
  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
  )
}
