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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql)
}
