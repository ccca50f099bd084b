package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted aggregation equals unsalted on a skewed key") {
    val ev = graft.sources.Tables.events(spark, sf)
    val want = ev.groupBy("event_type")
      .agg(sum("value").as("total"), count(lit(1)).as("n"),
        max("value").as("mx"), min("value").as("mn"))
    val got = Salting.saltedAgg(ev, Seq("event_type"), salts = 8,
      Salting.sumOf("value", "total"), Salting.countAll("n"),
      Salting.maxOf("value", "mx"), Salting.minOf("value", "mn"))
    // compare with rounding (double sum order differs across phases)
    val w = want.withColumn("total", round(col("total"), 6)).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val g = got.withColumn("total", round(col("total"), 6)).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(g.keySet === w.keySet)
    g.foreach { case (k, (t, n, mx, mn)) =>
      val (t2, n2, mx2, mn2) = w(k)
      assert(n === n2 && mx === mx2 && mn === mn2)
      assert(math.abs(t - t2) < 1e-5)
    }
  }

  test("phase-1 spreads a hot key over multiple salt groups") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1.0)).toDF("k", "v")
    val salted = hot.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
    assert(salted.select("__salt").distinct().count() > 1)
  }
}
