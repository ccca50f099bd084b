package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Corpus-level rollups for the training-data pipeline (SURVEY §2D/F):
  * per-(source, lang) document statistics and a day-bucketed range join.
  * Ratios are ratios-of-integer-sums (one IEEE division) — hash-exact.
  */
object CorpusStats {

  /** Per-slice corpus statistics: doc counts, volume, stopword density. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val padded = concat(lit(" "), col("text"), lit(" "))
    def occ(needle: String) =
      ((length(padded) - length(replace(padded, lit(needle), lit("")))) / needle.length)
        .cast("long")
    d.select(col("source"), col("lang"),
        length(col("text")).cast("long").as("chars"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"),
        (occ(" the ") + occ(" and ") + occ(" of ")).as("stops"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("total_chars"),
        sum(col("toks")).as("total_tokens"),
        (sum(col("stops")).cast("double") / sum(col("toks"))).as("stop_density"))
  }

  val corpusStatsSql: String = {
    def occ(n: String) =
      s"CAST((length(' '||text||' ') - length(replace(' '||text||' ', '$n', ''))) / ${n.length} AS BIGINT)"
    s"""SELECT source, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
       |  CAST(SUM(CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)) AS BIGINT) AS total_tokens,
       |  CAST(SUM(${occ(" the ")} + ${occ(" and ")} + ${occ(" of ")}) AS DOUBLE)
       |    / SUM(CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)) AS stop_density
       |FROM documents GROUP BY source, lang""".stripMargin
  }

  /** Range join: per purchase event, activity of the same user in the
    * following hour. Scalable shape: each anchor expands to its two
    * covering hour buckets, equi-join on (user, hour_bucket) — co-
    * partitioned, never a nested-loop range scan — then the exact
    * interval predicate filters inside buckets. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val follow = ev.select(col("user_id").as("f_user"), col("ts").as("f_ts"),
        date_trunc("hour", col("ts")).as("bucket"))
    val anchors = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("bucket", explode(array(
        date_trunc("hour", col("ts")),
        date_trunc("hour", col("ts") + expr("INTERVAL 1 HOUR")))))
    anchors.join(follow,
        anchors("user_id") === follow("f_user") && anchors("bucket") === follow("bucket"))
      .filter(col("f_ts") > col("ts") && col("f_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_follow"),
        min(col("f_ts")).as("first_follow_ts"))
  }

  val qRangeJoinSql: String =
    """SELECT a.event_id, COUNT(*) AS n_follow, MIN(f.ts) AS first_follow_ts
      |FROM events a JOIN events f
      |  ON a.user_id = f.user_id
      | AND f.ts > a.ts AND f.ts <= a.ts + INTERVAL 1 HOUR
      |WHERE a.event_type = 'purchase'
      |GROUP BY a.event_id""".stripMargin

  /** Exact interpolated percentiles per event type (both engines use
    * linear interpolation over the sorted values — order-independent). */
  def evtPercentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
  }

  val evtPercentilesSql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99
      |FROM events GROUP BY event_type""".stripMargin

  /** Per-dimension embedding moments — the normalization pass every
    * embedding pipeline runs before clustering/ANN (mean-centering,
    * variance scaling, clipping bounds). posexplode fans each vector
    * into (dim, value) rows, but partial aggregation folds them map-side
    * to 64 rows per task BEFORE the exchange — the shuffle carries
    * O(dims × partitions), never O(n × dims). Determinism: values are
    * rounded to 6dp once and summed as DECIMAL (exact in any order);
    * mean/variance are then one fixed IEEE chain, rounded to 6dp. */
  def embDimStats(spark: SparkSession, dir: String): DataFrame = {
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val n = count(lit(1))
    val meanRaw = sum(col("rv")).cast("double") / n
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"), col("v").cast("double").as("dv"))
      .withColumn("rv", round(col("dv"), 6).cast(d6))
      .groupBy(col("dim"))
      .agg(n.as("n"),
        round(meanRaw, 6).as("mean"),
        round(sum(col("rv") * col("rv")).cast("double") / n - meanRaw * meanRaw, 6)
          .as("variance"),
        min(col("dv")).as("min_v"),
        max(col("dv")).as("max_v"))
  }

  val embDimStatsSql: String =
    """WITH x AS (
      |  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
      |         unnest(embedding) AS v
      |  FROM embeddings),
      |y AS (SELECT dim, CAST(v AS DOUBLE) AS dv,
      |        CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(18,6)) AS rv FROM x)
      |SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(rv) AS DOUBLE) / count(*), 6) AS mean,
      |  round(CAST(sum(rv * rv) AS DOUBLE) / count(*)
      |    - (CAST(sum(rv) AS DOUBLE) / count(*)) * (CAST(sum(rv) AS DOUBLE) / count(*)), 6) AS variance,
      |  min(dv) AS min_v, max(dv) AS max_v
      |FROM y GROUP BY dim""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_dim_stats" -> (embDimStats _),
    "corpus_stats" -> (corpusStats _),
    "q_range_join" -> (qRangeJoin _),
    "evt_percentiles" -> (evtPercentiles _),
  )

  val oracles: Map[String, String] = Map(
    "emb_dim_stats" -> embDimStatsSql,
    "corpus_stats" -> corpusStatsSql,
    "q_range_join" -> qRangeJoinSql,
    "evt_percentiles" -> evtPercentilesSql,
  )
}
