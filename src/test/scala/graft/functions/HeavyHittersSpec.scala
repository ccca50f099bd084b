package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The Misra-Gries `HeavyHitters` aggregate in the regime the driver
  * query can't reach: capacity ≪ distinct keys, so decrements and the
  * mergeable-summaries merge actually fire (the oracle-checked
  * `evt_approx_topk` runs with capacity above the corpus cardinality and
  * is exact by construction). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def topMap(row: Row): Map[Long, Long] =
    row.getSeq[Row](0).map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("capacity << cardinality: heavy keys survive with bounded-error lower counts") {
    // skewed stream: key 1 ×1000, key 2 ×500, 5000 distinct noise keys ×1
    val data = Seq.fill(1000)(1L) ++ Seq.fill(500)(2L) ++ (10L until 5010L)
    val n = data.size
    val cap = 64
    val err = n / (cap + 1) // ~100
    val got = topMap(data.toDF("k").repartition(8) // force partial + merge path
      .agg(GraftFunctions.heavy_hitters(col("k"), cap, 10)).head())
    // guaranteed presence for true frequency > n/(cap+1), at the top ranks
    assert(got.contains(1L), s"heavy key 1 evicted: $got")
    assert(got.contains(2L), s"heavy key 2 evicted: $got")
    // counts are lower bounds within the MG error envelope
    val freq = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (k, c) =>
      val f = freq(k)
      assert(c <= f, s"key $k overcounted: $c > $f")
      assert(c >= f - err, s"key $k undercounted beyond n/(cap+1): $c < $f - $err")
    }
  }

  test("capacity >= cardinality: exact ordered counts regardless of partitioning") {
    val data = (0 until 1000).map(i => (i % 37).toLong)
    val exact = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (k, c) => (-c, k) }
    val got = data.toDF("k").repartition(5)
      .agg(GraftFunctions.heavy_hitters(col("k"), 4096, 37)).head()
      .getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))
    assert(got === exact)
  }

  test("fuzz: 40 random skewed streams × capacities × partitionings obey MG bounds") {
    val rnd = new scala.util.Random(20260813L)
    for (i <- 1 to 40) {
      val n = 200 + rnd.nextInt(2000)
      // cubing skews toward small keys: genuine heavy hitters + long tail
      val data = Seq.fill(n)((math.pow(rnd.nextDouble(), 3) * 100).toLong)
      val cap = 8 + rnd.nextInt(64)
      val parts = 1 + rnd.nextInt(8)
      val err = n / (cap + 1)
      // k = cap: the whole summary is emitted, so presence is testable
      val got = topMap(data.toDF("k").repartition(parts)
        .agg(GraftFunctions.heavy_hitters(col("k"), cap, cap)).head())
      val freq = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      freq.foreach { case (k, f) =>
        if (f > err) assert(got.contains(k),
          s"case $i (n=$n cap=$cap parts=$parts): key $k f=$f > err=$err evicted")
      }
      got.foreach { case (k, c) =>
        val f = freq(k)
        assert(c <= f && c >= f - err,
          s"case $i (n=$n cap=$cap parts=$parts): key $k count $c outside [${f - err}, $f]")
      }
    }
  }

  test("fuzz: bottom-k sample is exact under any partitioning, duplicates included") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 25).foreach { _ =>
      val n = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(40)
      val parts = 1 + rnd.nextInt(12)
      // ids with duplicates; hash deliberately collides (mod 97) so the
      // (h, id) tiebreak path is exercised
      val ids = Seq.fill(n)(rnd.nextInt(150).toLong)
      val pairs = ids.map(id => (id % 97 * 31 % 97, id))
      val want = pairs.distinct.sorted.take(k)
      val got = pairs.toDF("h", "id").repartition(parts)
        .agg(GraftFunctions.bottom_k_sample(col("h"), col("id"), k)).head()
        .getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))
      assert(got === want, s"n=$n k=$k parts=$parts")
    }
  }

  test("serialization roundtrip preserves the counter set") {
    val hh = HeavyHitters(org.apache.spark.sql.catalyst.expressions.Literal(1L), 8, 8)
    val buf = hh.createAggregationBuffer()
    Seq(1L -> 5L, 2L -> 3L, -7L -> 1L).foreach { case (k, v) => buf.put(k, v) }
    val back = hh.deserialize(hh.serialize(buf))
    assert(back === buf)
  }
}
