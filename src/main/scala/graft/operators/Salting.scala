package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (a handful of doc ids / users
  * owning a large share of the mutation log — the norm in web3 event
  * streams).
  *
  * `saltedAgg` runs any algebraic aggregation in two phases: phase 1
  * groups on (key, salt) — the hot key's rows spread over `salts`
  * reducers — phase 2 merges the partials per key. For commutative/
  * associative aggregates the result is exactly the unsalted answer.
  * AQE's skew-join handling covers joins; this covers aggregations,
  * where AQE cannot split a single hot reduce key.
  */
object Salting {

  final case class AggSpec(phase1: String => Column, phase2: String => Column,
      out: String)

  /** sum(col) as out */
  def sumOf(c: String, out: String): AggSpec =
    AggSpec(s => sum(col(c)).as(s), s => sum(col(s)).as(out), out)

  /** count(*) as out */
  def countAll(out: String): AggSpec =
    AggSpec(s => count(lit(1)).as(s), s => sum(col(s)).as(out), out)

  /** max(col) as out */
  def maxOf(c: String, out: String): AggSpec =
    AggSpec(s => max(col(c)).as(s), s => max(col(s)).as(out), out)

  /** min(col) as out */
  def minOf(c: String, out: String): AggSpec =
    AggSpec(s => min(col(c)).as(s), s => min(col(s)).as(out), out)

  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      specs: AggSpec*): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(specs.nonEmpty, "at least one AggSpec required")
    // deterministic salt from the whole row's hash: a stage retry
    // re-derives the same salt per row (spark_partition_id /
    // monotonically_increasing_id would re-deal rows across salts on
    // retry — harmless for algebraic aggs, but nondeterministic plans
    // defeat replay debugging); hot keys still spread because their
    // non-key columns vary
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(specs.head.phase1("__p0"),
        specs.tail.zipWithIndex.map { case (sp, i) => sp.phase1(s"__p${i + 1}") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(specs.head.phase2("__p0"),
        specs.tail.zipWithIndex.map { case (sp, i) => sp.phase2(s"__p${i + 1}") }: _*)
  }
}
