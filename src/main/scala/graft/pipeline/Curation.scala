package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2D/F — corpus curation endpoints: text normalization and the
  * keep-list materialization that an LLM-data pipeline actually ships
  * (exact dedup + near-dup drop + quality floor, in one declarative
  * plan).
  */
object Curation {

  /** Canonical text normalization: lowercase, strip punctuation, collapse
    * whitespace, trim. Deterministic string ops — oracle-exact. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[.,;:!?]", " "),
          "\\s+", " ")).as("norm_text"))
      .withColumn("norm_chars", length(col("norm_text")).cast("long"))
  }

  val textNormalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text,
      |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS norm_chars
      |FROM documents""".stripMargin

  /** The pipeline endpoint: which documents survive curation.
    * Drop rules (each independently verifiable):
    *  1. exact duplicates — keep the min doc_id per content hash;
    *  2. near-duplicates — greedy-by-id: drop the higher id of every
    *     ngram-jaccard ≥ 0.5 pair (left_anti against the pair set);
    *  3. quality floor — ≥ 20 whitespace tokens.
    * One declarative plan: two aggregations + one anti join. */
  def pipelineKeepList(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val exactKeep = d
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val nearDupLosers = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("b_id").as("doc_id")).distinct()
    exactKeep
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(d.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(size(split(trim(col("text")), "\\s+")) >= 20)
      .select(col("doc_id"))
  }

  val pipelineKeepListSql: String =
    """WITH ng AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, greatest(len(string_split(trim(text), ' ')) - 2, 0) + 1),
      |      i -> string_split(trim(text), ' ')[i] || ' ' || string_split(trim(text), ' ')[i+1] || ' ' || string_split(trim(text), ' ')[i+2])) AS g
      |  FROM documents),
      |pairs AS (
      |  SELECT b.doc_id AS b_id
      |  FROM ng a JOIN ng b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(list_distinct(list_concat(a.g, b.g))) >= 0.5),
      |exact_keep AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
      |SELECT doc_id FROM exact_keep
      |WHERE doc_id NOT IN (SELECT b_id FROM pairs)
      |  AND doc_id IN (SELECT doc_id FROM documents
      |                 WHERE length(regexp_split_to_array(trim(text), '\s+')) >= 20)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_normalize" -> (textNormalize _),
    "pipeline_keep_list" -> (pipelineKeepList _),
  )

  val oracles: Map[String, String] = Map(
    "text_normalize" -> textNormalizeSql,
    "pipeline_keep_list" -> pipelineKeepListSql,
  )
}
