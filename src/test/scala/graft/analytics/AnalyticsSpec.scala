package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q1 groups are complete and counts sum to filtered rows") {
    val q1 = Analytics.q1Pricing(spark, sf)
    val total = q1.agg(sum("count_order")).head().getLong(0)
    val want = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp")).count()
    assert(total === want)
  }

  test("q6 pushes its filters to the parquet scan") {
    val plan = Analytics.q6FilterAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("evt_time_range pushes the nanos bounds into the parquet scan") {
    val plan = graft.events.EventQueries.evtTimeRange(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts") && plan.contains("LessThan(ts"))
  }

  test("q3 returns exactly 10 rows ordered by revenue desc") {
    val rows = Analytics.q3TopkJoin(spark, sf).collect()
    assert(rows.length === 10)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("q5 star join broadcasts every dimension") {
    val plan = Analytics.q5MultiJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") ||
      plan.indexOf("SortMergeJoin") === plan.lastIndexOf("SortMergeJoin"))
  }

  test("semi + anti partition the customer set") {
    val df = Analytics.qSemiAnti(spark, sf)
    val total = df.agg(sum("n_customers")).head().getLong(0)
    assert(total === graft.sources.Tables.customer(spark, sf).count())
  }

  test("window rank emits at most 3 rows per customer") {
    val over = Analytics.qWindowRank(spark, sf)
      .groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over === 0)
  }

  test("HLL sketch rollup estimates distinct users within 5% of exact") {
    val got = graft.events.EventQueries.evtSketchRollup(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("approx_users")).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === exact.keySet)
    got.foreach { case (t, est) =>
      val err = math.abs(est.toDouble - exact(t)) / exact(t)
      assert(err <= 0.05, s"$t est=$est exact=${exact(t)}")
    }
  }
}
