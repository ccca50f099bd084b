package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware twin dispatch. The bucketed forms of the as-of join and
  * of sessionization (AsOfJoin.asOfBucketed, EventQueries'
  * sessionizeBuckets) win ~1.5-2× under a hot key but cost ~2-3× on
  * uniform keys — and at 100 TB nobody knows the key histogram a
  * priori. This makes the choice automatic: ONE Misra-Gries pass over
  * the key column (the `HeavyHitters` mergeable sketch — partial state
  * ≤ capacity counters per partition, so the probe is a column-pruned
  * scan with a single-row result, never a shuffle of the key space)
  * estimates the hottest key's share, and the twin is picked by
  * whether that key would overfill one window task.
  *
  * Decision rule: the direct form puts the hot key's whole timeline in
  * one task, which holds share·n rows against an average task's n/P
  * (P = spark.sql.shuffle.partitions). Skewed iff
  * share ≥ skewFactor / P — parallelism-relative, so the same rule
  * tightens as the cluster (and P) grows, exactly when one straggler
  * task hurts most. With the default factor 4 and P=32 the cut is a
  * 12.5% share; ScaleSmoke's hot-user corpus (one user owning half the
  * events) sits far above it, real uniform corpora far below.
  *
  * The probe costs one narrow scan of the key column. With MG capacity
  * 256 the count error is ≤ n/257 (< 0.4% of share), negligible at the
  * decision boundary's scale.
  */
object SkewDispatch {

  /** Estimated share of the hottest key in `key` (must cast to BIGINT).
    * 0.0 on empty input. One HeavyHitters + count aggregate — a single
    * job, single-row result. */
  def maxKeyShare(df: DataFrame, key: Column, capacity: Int = 256): Double = {
    val r = df.agg(
      graft.functions.GraftFunctions
        .heavy_hitters(key.cast("long"), capacity, 1).as("hh"),
      count(key).as("n")).head()
    val n = r.getLong(1)
    if (n == 0L) 0.0
    else {
      val hh = r.getSeq[org.apache.spark.sql.Row](0)
      if (hh.isEmpty) 0.0 else hh.head.getLong(1).toDouble / n
    }
  }

  /** True when a key of this share overfills one window task:
    * share ≥ skewFactor / spark.sql.shuffle.partitions. */
  def isSkewed(df: DataFrame, share: Double, skewFactor: Double = 4.0): Boolean = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    share >= skewFactor / p.max(1)
  }

  /** Probe + rule in one call. */
  def decide(df: DataFrame, key: Column, skewFactor: Double = 4.0): Boolean =
    isSkewed(df, maxKeyShare(df, key), skewFactor)
}
