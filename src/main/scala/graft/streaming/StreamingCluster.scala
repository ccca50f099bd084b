package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.ClusterIndex

/** STREAMING CLUSTER MAINTENANCE — the third leg of the
  * continuous-ingestion triangle (exact/near-dup flags:
  * [[StreamingDedup]]; ANN coverage: `AnnIndex.append`; cluster
  * membership: here). Documents arrive on a file stream and every
  * micro-batch is merged into a persisted [[ClusterIndex]] via
  * `appendDocs` — O(batch + touched clusters) per trigger, never a
  * corpus re-pair.
  *
  * Two properties make this lane trivially correct where the dedup lane
  * needed its own state discipline:
  *   - ORDER-INDEPENDENCE: cluster labels are component MINIMA, and the
  *     merge algebra yields the true minima of the union at every step,
  *     so any arrival order of the same docs converges to the identical
  *     membership (no doc_id-ordered-arrival contract);
  *   - REPLAY-IDEMPOTENCE: a crash-replayed micro-batch anti-joins the
  *     covered ledger its first run committed and no-ops; a crash
  *     MID-append leaves an orphan generation or a half-swapped
  *     manifest, both healed by the artifact's own discipline.
  * The stream itself therefore carries no state directories — the index
  * IS the state.
  */
object StreamingCluster {

  /** Maintain `indexDir` (an existing [[ClusterIndex]]) from documents
    * streaming in under `srcDir`. Serial by construction: foreachBatch
    * runs one micro-batch at a time, satisfying appendDocs's
    * single-writer contract. After each append the lifecycle tick folds
    * the artifact once `maxGens` generations accumulate (the
    * `rollupIfDue` pattern) — a week-long stream holds O(maxGens) gen
    * dirs, not one per micro-batch. A crash between the append and the
    * compact loses nothing: compaction is a pure re-layout, retried at
    * the next tick. */
  def clusterMaintainStream(spark: SparkSession, srcDir: String,
      indexDir: String, checkpointDir: String,
      glob: String = "documents.parquet", filesPerTrigger: Int = 0,
      maxGens: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val r = spark.readStream.schema(Streaming.docSchema)
      .option("pathGlobFilter", glob)
    val src = (if (filesPerTrigger > 0)
      r.option("maxFilesPerTrigger", filesPerTrigger.toString) else r)
      .parquet(srcDir)
    src.writeStream
      .foreachBatch { (mb: DataFrame, _: Long) =>
        // the micro-batch's OWN session (the documented foreachBatch
        // footgun: the outer session's per-batch configs may diverge)
        val s = mb.sparkSession
        if (!mb.isEmpty) {
          ClusterIndex.appendDocs(s, mb, indexDir)
          ClusterIndex.compactIfDue(s, indexDir, maxGens)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
