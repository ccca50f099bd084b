package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY.md §2D — multimodal-column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata; the
  * decode / feature-extract step runs BATCHED per partition via a typed
  * `mapPartitions` (the Scala analog of `mapInPandas`: one opaque decoder
  * instantiation per batch, not per row — the shape a real image/audio
  * codec needs). The decoder here is a DETERMINISTIC STUB (no media libs
  * in this container): it derives fake width/height/frames from the bytes.
  * Everything around it — binary schema, metadata, batching, partition
  * parallelism — is the real plumbing and is oracle-checked.
  */
case class MediaRow(doc_id: Long, n_bytes: Long, sha: String)
case class DecodedMedia(doc_id: Long, n_bytes: Long, sha: String,
    width: Long, height: Long, n_frames: Long)
case class FeatRow(doc_id: Long, dim: Long, feat: Long)

object Multimodal {

  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withBin = Tables.documents(spark, dir)
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha"))
      .as[MediaRow]
    // Batched opaque decode: one "decoder" per partition, rows streamed
    // through it. STUB: replace decodeStub with a real codec binding.
    withBin.mapPartitions { rows =>
      val decoder = new Object // per-partition decoder instantiation point
      rows.map { r =>
        val _ = decoder
        decodeStub(r)
      }
    }.toDF()
  }

  /** Deterministic fake decode — stands in for image/audio decoding. */
  private def decodeStub(r: MediaRow): DecodedMedia =
    DecodedMedia(r.doc_id, r.n_bytes, r.sha,
      width = r.n_bytes % 640L,
      height = (r.n_bytes * 31L) % 480L,
      n_frames = (r.doc_id % 10L) + 1L)

  val mmBinaryMetaSql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, sha256(text) AS sha,
      |  CAST(strlen(text) AS BIGINT) % 640 AS width,
      |  (CAST(strlen(text) AS BIGINT) * 31) % 480 AS height,
      |  (doc_id % 10) + 1 AS n_frames
      |FROM documents""".stripMargin

  /** Frame sampling: a uniform-stride schedule of up to 4 frames per
    * video, computed from the decoded frame count — the plan a real
    * frame extractor executes (idx_j = ⌊j·n/4⌋, deduped when n < 4).
    * Pure column math over the decode output; the extraction itself
    * would be another batched opaque pass. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 4
    mmBinaryMeta(spark, dir)
      .select(col("doc_id"), col("n_frames"),
        explode(array_distinct(transform(sequence(lit(0), lit(k - 1)),
          j => (j * col("n_frames") / k).cast("long")))).as("frame_idx"))
  }

  val mmFrameSampleSql: String =
    """SELECT DISTINCT doc_id, (doc_id % 10) + 1 AS n_frames,
      |  (j * ((doc_id % 10) + 1)) // 4 AS frame_idx
      |FROM documents, range(4) t(j)""".stripMargin

  /** Batched feature extraction (the `mapInPandas` shape in Scala): one
    * "model" instantiation per partition, rows streamed through it, an
    * 8-dim feature row per (doc, dim). The model is a DETERMINISTIC STUB
    * (integer mix of payload length and id — no media/ML libs in this
    * container); the batching, typed long-format output, and partition
    * parallelism are the real plumbing, oracle-checked. */
  def mmFeatureStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = 8
    Tables.documents(spark, dir)
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("n_bytes"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val model = new Object // per-partition model-load point
        rows.flatMap { case (docId, nBytes) =>
          val _ = model
          (0 until dims).map { i =>
            FeatRow(docId, i.toLong,
              (nBytes * (31 + 7 * i) + docId * (17 + 3 * i)) % 1000)
          }
        }
      }.toDF()
  }

  val mmFeatureStubSql: String =
    """SELECT doc_id, j AS dim,
      |  (CAST(strlen(text) AS BIGINT) * (31 + 7 * j) + doc_id * (17 + 3 * j)) % 1000 AS feat
      |FROM documents, range(8) t(j)""".stripMargin

  /** Resize planning: target dimensions fitting the decoded frame into
    * 224×224 preserving aspect ratio — integer math over the decode
    * metadata (the resize itself is the next batched opaque pass). */
  def mmResizePlan(spark: SparkSession, dir: String): DataFrame = {
    mmBinaryMeta(spark, dir)
      .withColumn("w1", greatest(col("width"), lit(1L)))
      .withColumn("h1", greatest(col("height"), lit(1L)))
      .select(col("doc_id"), col("w1"), col("h1"),
        when(col("w1") >= col("h1"), 224L)
          .otherwise(expr("(w1 * 224) div h1")).as("new_w"),
        when(col("w1") >= col("h1"), expr("(h1 * 224) div w1"))
          .otherwise(224L).as("new_h"))
  }

  val mmResizePlanSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    greatest(CAST(strlen(text) AS BIGINT) % 640, 1) AS w1,
      |    greatest((CAST(strlen(text) AS BIGINT) * 31) % 480, 1) AS h1
      |  FROM documents)
      |SELECT doc_id, w1, h1,
      |  CASE WHEN w1 >= h1 THEN 224 ELSE (w1 * 224) // h1 END AS new_w,
      |  CASE WHEN w1 >= h1 THEN (h1 * 224) // w1 ELSE 224 END AS new_h
      |FROM d""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_feature_stub" -> (mmFeatureStub _),
    "mm_resize_plan" -> (mmResizePlan _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_feature_stub" -> mmFeatureStubSql,
    "mm_resize_plan" -> mmResizePlanSql)
}
