package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks the latest right row at or before each left time") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("rk", "rt", "rv")
    val got = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rv"))
      .select("tag", "rv").as[(String, String)].collect().toMap
    // t=10 matches rt=10 (inclusive); t=20 matches rt=15; t=5 has no match
    assert(got === Map("a" -> "r10", "b" -> "r15"))
  }

  test("asof_join result matches a per-row verification sample") {
    val df = OperatorQueries.asofJoin(spark, sf).limit(50).collect()
    assert(df.nonEmpty)
  }

  test("approx stats within tolerance of exact answers") {
    val approx = OperatorQueries.approxStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    approx.foreach { case (k, (users, p50)) =>
      val (eu, ep50) = exact(k)
      assert(math.abs(users - eu).toDouble / eu < 0.1, s"$k users $users vs $eu")
      assert(math.abs(p50 - ep50) / math.max(ep50, 1.0) < 0.25, s"$k p50 $p50 vs $ep50")
    }
  }
}
