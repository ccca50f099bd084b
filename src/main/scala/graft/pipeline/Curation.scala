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

  /** Deterministic train/val/test split via a multiplicative hash of the
    * doc key (Knuth's 2654435761 mod 100 → 90/5/5) — reproducible across
    * runs and engines, no RNG, stable under repartitioning. */
  def pipelineTrainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(col("doc_id") * 2654435761L, lit(100L))
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
  }

  val pipelineTrainSplitSql: String =
    """SELECT CASE WHEN (doc_id * 2654435761) % 100 < 90 THEN 'train'
      |            WHEN (doc_id * 2654435761) % 100 < 95 THEN 'val'
      |            ELSE 'test' END AS split,
      |       lang, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** Vocabulary building: corpus-wide token frequencies, top 100 with
    * deterministic tiebreak — the input to tokenizer/BPE training. */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(100)
  }

  val textVocabSql: String =
    """SELECT token, COUNT(*) AS freq
      |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents) t
      |WHERE length(token) > 0
      |GROUP BY token ORDER BY freq DESC, token ASC LIMIT 100""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_normalize" -> (textNormalize _),
    "pipeline_keep_list" -> (pipelineKeepList _),
    "pipeline_train_split" -> (pipelineTrainSplit _),
    "text_vocab" -> (textVocab _),
  )

  val oracles: Map[String, String] = Map(
    "text_normalize" -> textNormalizeSql,
    "pipeline_keep_list" -> pipelineKeepListSql,
    "pipeline_train_split" -> pipelineTrainSplitSql,
    "text_vocab" -> textVocabSql,
  )
}
