package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero exchanges") {
    Bucketing.bucketize(spark, sf, "lineitem", "l_orderkey", 4, "li_bucketed")
    Bucketing.bucketize(spark, sf, "orders", "o_orderkey", 4, "ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    // and it still computes the right thing
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    assert(joined.exceptAll(want).count() === 0)
    assert(want.exceptAll(joined).count() === 0)
  }
}
