package graft.events

import scala.util.Random

import graft.SparkSpec

/** Property proof that the ghost-replicated bucketed rate limit is
  * EXACTLY the direct full-history RANGE window on adversarial streams —
  * the driver oracle pins the equivalence on real corpora; this pins the
  * boundary cases those corpora may never hit: events exactly windowUs
  * apart (outside the frame — RANGE reaches back windowUs−1), window±1,
  * same-µs bursts (RANGE peers — every member gets the full group
  * count), events exactly on bucket edges and in the ghost band
  * (last windowUs of a bucket), and the minimum legal bucket
  * (bucket == window) where every frame crosses a boundary. */
class RateLimitFuzzSpec extends SparkSpec {

  test("bucketed rate limit == direct rate limit on 150 adversarial streams") {
    import spark.implicits._
    val rnd = new Random(20260815L)
    val windowUs = 100L
    (1 to 150).foreach { trial =>
      val bucketUs = Seq(windowUs, windowUs + 1, 2 * windowUs, 10 * windowUs)(rnd.nextInt(4))
      val maxPerHour = 1L + rnd.nextInt(3)
      val deltas = Seq(0L, 0L, 1L, windowUs - 1, windowUs, windowUs + 1,
        bucketUs - 1, bucketUs, bucketUs + 1)
      var nextId = 0L
      val rows = (1 to (1 + rnd.nextInt(4))).flatMap { user =>
        // streams may START pre-epoch: `div` truncates toward zero, so
        // negative timestamps once mis-edged buckets and dropped
        // cross-bucket contributors (caught in review; floor-div fix)
        var ts = rnd.nextInt(50).toLong -
          (if (rnd.nextBoolean()) 5L * bucketUs else 0L)
        (0 until rnd.nextInt(60)).map { _ =>
          ts += (if (rnd.nextBoolean()) deltas(rnd.nextInt(deltas.length))
                 else rnd.nextInt(3 * bucketUs.toInt).toLong)
          nextId += 1
          (nextId * 7919 % 104729, user.toLong, ts)
        }
      }
      if (rows.nonEmpty) {
        assert(rows.map(_._1).distinct.length == rows.length, "id collision in generator")
        val ev = rows.toDF("event_id", "user_id", "ts_us")
        def run(df: org.apache.spark.sql.DataFrame) = df
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(t => (t._2, t._3, t._1))
        val direct = run(EventQueries.rateLimitDirect(ev, maxPerHour, windowUs))
        val bucketed = run(EventQueries.rateLimitBuckets(ev, maxPerHour, windowUs, bucketUs))
        assert(direct.sameElements(bucketed),
          s"trial=$trial bucketUs=$bucketUs max=$maxPerHour: " +
            s"direct=${direct.take(10).mkString(",")} vs bucketed=${bucketed.take(10).mkString(",")}")
      }
    }
  }

  test("bucketed rate limit rejects bucket < window") {
    import spark.implicits._
    val ev = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "ts_us")
    intercept[IllegalArgumentException] {
      EventQueries.rateLimitBuckets(ev, 2L, 100L, 99L)
    }
  }
}
