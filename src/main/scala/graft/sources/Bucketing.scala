package graft.sources

import org.apache.spark.sql.SparkSession

/** Bucketed-layout writer — the cluster-scale path for repeated fact-fact
  * equi-joins: both sides written with `bucketBy(n, key).sortBy(key)`
  * co-locate matching keys, so the join plans with ZERO exchanges (and
  * zero sorts when sorted). At 100 TB this converts every recurring
  * join/aggregate on the bucket key from a full shuffle into a local
  * merge — the Spark-native analog of the reference's per-key index
  * locality. Verified in BucketingSpec: the bucketed join plan contains
  * no Exchange operator. */
object Bucketing {

  def bucketize(spark: SparkSession, dir: String, table: String,
      key: String, buckets: Int, as: String): Unit = {
    Tables.load(spark, dir, table)
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(as)
  }
}
