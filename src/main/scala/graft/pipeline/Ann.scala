package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * `ann_lsh` is the scale path: random-hyperplane LSH buckets both sides;
  * only same-bucket candidates are scored, turning O(n·q) into
  * O(candidates). Recall is tunable by bits/tables.
  */
object Ann {

  private val K = 10

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

  /** Random-hyperplane LSH: 12 signature bits from deterministic pseudo-
    * hyperplanes (splitmix64-seeded), bucket join, exact rescoring inside
    * buckets, top-k per query among candidates. Rows-only check. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val bits = 12
    val dim = 64
    // deterministic hyperplanes: component j of plane b from splitmix64
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val planes: Seq[Seq[Double]] = (0 until bits).map { b =>
      (0 until dim).map { j => (mix(b.toLong * 1024 + j).toDouble / Long.MaxValue) }
    }
    val planeLits = array(planes.map(p => array(p.map(lit): _*)): _*)

    val e = Tables.embeddings(spark, dir)
    // sig bit b = sign(dot(v, plane_b)); bucket = packed bits
    val sig = aggregate(
      zip_with(planeLits, sequence(lit(0), lit(bits - 1)), (plane, b) =>
        when(aggregate(zip_with(col("embedding"), plane, (x, p) => x * p),
          lit(0.0), (acc, x) => acc + x) > 0, pow(lit(2.0), b).cast("long"))
          .otherwise(0L)),
      lit(0L), (acc, x) => acc + x)

    val bucketed = e.withColumn("bucket", sig)
    val q = bucketed.filter(col("vec_id") < 20)
      .select(col("bucket"), col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val cand = bucketed.select(col("bucket"), col("vec_id").as("cand_id"), col("embedding").as("c_v"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    q.join(cand, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine_sim(col("q_v"), col("c_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("cand_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the other scale path: partition the corpus
    * into C centroid cells (deterministic seeds = lowest vec_ids, one
    * Lloyd refinement), probe the nprobe nearest cells per query, exact
    * cosine only inside probed cells. Search cost drops from O(n) to
    * O(n·nprobe/C) per query; recall is tunable via nprobe. Rows-only
    * (recall spec-checked against brute force). */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val C = 16
    val nprobe = 8
    val e = Tables.embeddings(spark, dir)

    // seed centroids: the C lowest vec_ids (deterministic)
    val seeds = e.filter(col("vec_id") < C)
      .select(col("vec_id").as("cid"), col("embedding").as("centroid"))

    def nearestCell(points: DataFrame, cents: DataFrame, rank: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("sim").desc, col("cid").asc)
      points.crossJoin(broadcast(cents))
        .withColumn("sim", cosine_sim(col("embedding"), col("centroid")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= rank)
        .drop("centroid", "sim", "crank")
    }

    // one Lloyd refinement: mean of assigned vectors per cell, per dim
    val assigned0 = nearestCell(e, seeds, 1)
    val refined = assigned0
      .select(col("cid"), posexplode(col("embedding")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m").cast("float")).as("centroid"))

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> (annCosineTopk _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
  )

  val oracles: Map[String, String] = Map(
    "ann_cosine_topk" -> annCosineTopkSql,
  )
}
