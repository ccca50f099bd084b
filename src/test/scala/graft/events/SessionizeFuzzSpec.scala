package graft.events

import scala.util.Random

import graft.SparkSpec

/** Property proof that the two-phase bucketed sessionize is EXACTLY the
  * direct window form on adversarial streams — the driver oracle pins
  * the equivalence on real corpora; this pins the boundary cases those
  * corpora may never hit: inter-event gaps of exactly the threshold
  * (NOT a break — the rule is strict >), gap±1, same-timestamp events
  * ordered by event_id, events landing exactly on bucket edges, and
  * tiny buckets (bucket = gap+1) that force sessions to span many
  * buckets and merge transitively through long chains. */
class SessionizeFuzzSpec extends SparkSpec {

  test("bucketed sessionize == direct sessionize on 150 adversarial streams") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    val gapUs = 100L
    (1 to 150).foreach { trial =>
      val bucketUs = Seq(gapUs + 1, 2 * gapUs, 10 * gapUs)(rnd.nextInt(3))
      val deltas = Seq(0L, 1L, gapUs - 1, gapUs, gapUs + 1,
        bucketUs - 1, bucketUs, bucketUs + 1)
      var nextId = 0L
      val rows = (1 to (1 + rnd.nextInt(4))).flatMap { user =>
        var ts = rnd.nextInt(50).toLong
        (0 until rnd.nextInt(60)).map { _ =>
          ts += (if (rnd.nextBoolean()) deltas(rnd.nextInt(deltas.length))
                 else rnd.nextInt(3 * bucketUs.toInt).toLong)
          nextId += 1
          // shuffled ids: same-ts tiebreak order must not follow insert order
          (user.toLong, ts, nextId * 7919 % 104729)
        }
      }
      if (rows.nonEmpty) {
        assert(rows.map(_._3).distinct.length == rows.length, "id collision in generator")
        val ev = rows.toDF("user_id", "ts_us", "event_id")
        val direct = EventQueries.sessionizeDirect(ev, gapUs)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .sortBy(t => (t._1, t._2))
        val bucketed = EventQueries.sessionizeBuckets(ev, gapUs, bucketUs)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .sortBy(t => (t._1, t._2))
        assert(direct.sameElements(bucketed),
          s"trial=$trial bucketUs=$bucketUs: " +
            s"direct=${direct.take(10).mkString(",")} vs bucketed=${bucketed.take(10).mkString(",")}")
      }
    }
  }
}
