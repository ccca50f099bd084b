package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Subscription push — the reference's `Subscribe(SubscribeRequest) →
  * stream EventMessage` surface (db3_storage.proto:69-83,199): a
  * subscriber registers a topic list (Block / Mutation) and the node
  * pushes matching events from one shared broadcast channel
  * (storage_node_light_impl.rs:418 subscribe; the block proposer sends
  * BlockEvent{block_id, mutation_count} to every subscriber).
  *
  * Spark-native shape: ONE streaming evaluation of the mutation log per
  * collection, fanned out inside foreachBatch to N per-subscriber sinks —
  * the micro-batch is cached once, each subscriber applies only a topic
  * filter, so adding a subscriber costs one filtered write, never a
  * second stream or a re-read of the source (the Tokio broadcast channel
  * re-expressed). Event rows mirror the proto:
  *   Block:    one row per block — (block_id, mutation_count)
  *   Mutation: one row per mutation header — (block, order, action, id)
  */
object Subscriptions {

  val TopicBlock = "Block"
  val TopicMutation = "Mutation"

  /** A subscriber = name + topic set (proto `Subscription{topics}`). */
  final case class Subscription(subscriber: String, topics: Set[String]) {
    require(topics.nonEmpty && topics.forall(Set(TopicBlock, TopicMutation)),
      s"unsupported topics: $topics")
  }

  /** Start the push stream over a collection's live mutation tail:
    * matching events append to `outDir/<subscriber>/<topic>/` as parquet.
    * Returns the started query; callers own its lifecycle. */
  def subscribe(spark: SparkSession, mutationsDir: String,
      subs: Seq[Subscription], outDir: String): StreamingQuery = {
    require(subs.map(_.subscriber).distinct.size == subs.size,
      "duplicate subscriber names")
    spark.readStream
      .schema(graft.api.GraftDB.mutationSchema)
      .option("recursiveFileLookup", "true")
      .parquet(mutationsDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          batch.persist()
          try {
            val headers = batch.select("block", "order", "action", "id")
            val blockEvents = batch.groupBy(col("block").as("block_id"))
              .agg(count(lit(1)).cast("int").as("mutation_count"))
            for (s <- subs) {
              if (s.topics(TopicMutation))
                headers.write.mode(SaveMode.Append)
                  .parquet(s"$outDir/${s.subscriber}/mutation")
              if (s.topics(TopicBlock))
                blockEvents.write.mode(SaveMode.Append)
                  .parquet(s"$outDir/${s.subscriber}/block")
            }
          } finally { batch.unpersist(); () }
        }
        ()
      }
      .start()
  }
}
