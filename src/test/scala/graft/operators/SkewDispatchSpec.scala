package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The skew-aware twin dispatcher: the probe's share estimate, the
  * parallelism-relative decision rule, and the dispatched operators
  * picking the right twin on a uniform vs a ScaleSmoke-style hot-key
  * corpus — with the dispatched result still exactly equal to the
  * direct form's (the twins share one output contract). */
class SkewDispatchSpec extends SparkSpec {
  import spark.implicits._

  /** ScaleSmoke's skew construction in miniature: half of all events
    * re-mapped to ONE user. */
  private def hotEvents: DataFrame =
    Tables.events(spark, sf).withColumn("user_id",
      when(pmod(col("event_id"), lit(2)) === 0, lit(7L))
        .otherwise(col("user_id")))

  test("maxKeyShare: near-exact on a planted hot key, small on uniform") {
    val uniformShare = SkewDispatch.maxKeyShare(
      Tables.events(spark, sf), col("user_id"))
    val hotShare = SkewDispatch.maxKeyShare(hotEvents, col("user_id"))
    // MG error bound is n/257 of the count, far below these margins
    assert(hotShare > 0.45 && hotShare < 0.60, s"hot share $hotShare")
    assert(uniformShare < 0.10, s"uniform share $uniformShare")
  }

  test("decision is parallelism-relative: skewFactor / shuffle partitions") {
    val ev = Tables.events(spark, sf) // P = 4 in tests → cut = 4/4 = 1.0
    assert(!SkewDispatch.isSkewed(ev, 0.99))
    assert(SkewDispatch.isSkewed(ev, 1.0))
    assert(SkewDispatch.isSkewed(ev, 0.5, skewFactor = 2.0))
    assert(!SkewDispatch.decide(ev, col("user_id"))) // uniform corpus
    assert(SkewDispatch.decide(hotEvents, col("user_id"), skewFactor = 1.0))
  }

  test("asOfAuto picks direct on uniform, bucketed on the hot corpus, equal results") {
    val ord = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    def run(ev: DataFrame, skewFactor: Double) =
      AsOfJoin.asOfAuto(ev.select("event_id", "user_id", "ts"), ord,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey"),
        skewFactor = skewFactor)
    // the bucketed plan is recognizable by its two-phase carry columns
    val uni = run(Tables.events(spark, sf), 4.0)
    assert(!uni.queryExecution.optimizedPlan.toString.contains("__bucket"),
      "uniform corpus should dispatch to the direct as-of")
    val hot = run(hotEvents, 1.0)
    assert(hot.queryExecution.optimizedPlan.toString.contains("__bucket"),
      "hot corpus should dispatch to the bucketed as-of")
    // dispatched output === direct output, on the corpus that dispatched
    // to the OTHER twin (the contract the shared oracle pins)
    val direct = AsOfJoin.asOf(hotEvents.select("event_id", "user_id", "ts"),
      ord, "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey"))
    assert(hot.collect().map(_.toString).sorted
      .sameElements(direct.collect().map(_.toString).sorted))
  }

  test("evt_sessionize_auto equals the direct sessionize on the real corpus") {
    val auto = graft.events.EventQueries.all("evt_sessionize_auto")(spark, sf)
    val direct = graft.events.EventQueries.all("evt_sessionize")(spark, sf)
    assert(!auto.queryExecution.optimizedPlan.toString.contains("lsid"),
      "uniform corpus should dispatch to the direct sessionize")
    assert(auto.collect().map(_.toString).sorted
      .sameElements(direct.collect().map(_.toString).sorted))
  }
}
