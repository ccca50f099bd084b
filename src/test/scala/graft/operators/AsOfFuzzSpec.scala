package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-fuzz the windowed as-of join against a brute-force
  * join-then-argmax reference. The window formulation (union both sides,
  * one key-partitioned scan, `last(..., ignoreNulls)`) is the shape that
  * scales — but its correctness rests on subtle ordering details
  * (right-before-left at equal t for the inclusive match, carry-forward
  * across interleaved rows), so it gets the same treatment as the doc
  * compilers: seeded random corpora with deliberate edge density —
  * duplicate left times, right times exactly equal to left times, keys
  * that exist on only one side, empty-right keys, heavy key skew.
  */
class AsOfFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join == brute-force argmax reference on 40 random corpora") {
    val rnd = new Random(8151)
    for (iter <- 1 to 40) {
      val nKeys = 1 + rnd.nextInt(6)
      // small time domain => many exact t collisions (the boundary case)
      val tMax = 3 + rnd.nextInt(12)
      val nLeft = 1 + rnd.nextInt(40)
      val nRight = rnd.nextInt(30) // 0 => everything unmatched
      val left = (1 to nLeft).map { i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(tMax).toLong)
      }.toDF("lid", "k", "t")
      val right = (1 to nRight).map { _ =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(tMax).toLong)
      }.distinct // contract: right unique per (key, time)
        .map { case (k, t) => (k, t, s"v${k}_$t") }
        .toDF("rk", "rt", "rv")

      val got = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rt", "rv"))
        .select($"lid", $"rt", $"rv")
        .as[(Long, Long, String)].collect().toSeq.sorted

      // brute force: all right rows at-or-before, keep the latest
      val want = left.join(right, $"k" === $"rk" && $"rt" <= $"t")
        .groupBy($"lid")
        .agg(max(struct($"rt", $"rv")).as("best"))
        .select($"lid", $"best.rt", $"best.rv")
        .as[(Long, Long, String)].collect().toSeq.sorted

      assert(got === want, s"iter=$iter nKeys=$nKeys tMax=$tMax " +
        s"nLeft=$nLeft nRight=$nRight")

      // the skew-resilient bucketed form must agree too — tiny buckets
      // (2 time units) force matches to cross MANY empty and non-empty
      // bucket boundaries, the carry path's hard case
      val gotBucketed = AsOfJoin.asOfBucketed(left, right, "k", "rk",
          "t", "rt", Seq("rt", "rv"), bucketUs = 2L)
        .select($"lid", $"rt", $"rv")
        .as[(Long, Long, String)].collect().toSeq.sorted
      assert(gotBucketed === want,
        s"bucketed: iter=$iter nKeys=$nKeys tMax=$tMax nLeft=$nLeft nRight=$nRight")
    }
  }

  test("null times mean 'since forever' in BOTH forms (30 corpora)") {
    // the direct form sorts null __t FIRST (nulls-first asc), so a
    // null-time right row's value carries into every later left row and
    // a null-time left row matches only null-time right state; the
    // bucketed form must agree (null coalesces to Long.MinValue before
    // bucketing). Reference: brute force on MinValue-coalesced times.
    val rnd = new Random(9157)
    val MIN = Long.MinValue
    for (iter <- 1 to 30) {
      val nKeys = 1 + rnd.nextInt(5)
      val tMax = 3 + rnd.nextInt(10)
      val nLeft = 1 + rnd.nextInt(30)
      val nRight = rnd.nextInt(20)
      val left = (1 to nLeft).map { i =>
        val t = if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(tMax).toLong)
        (i.toLong, rnd.nextInt(nKeys).toLong, t)
      }.toDF("lid", "k", "t")
      val right = (1 to nRight).map { _ =>
        val t = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(tMax).toLong)
        (rnd.nextInt(nKeys).toLong, t)
      }.distinct // unique per (key, time), ≤1 null-time row per key
        .map { case (k, t) => (k, t, s"v${k}_${t.getOrElse(-1L)}") }
        .toDF("rk", "rt", "rv")

      val want = left.join(right,
          $"k" === $"rk" && coalesce($"rt", lit(MIN)) <= coalesce($"t", lit(MIN)))
        .groupBy($"lid")
        .agg(max(struct(coalesce($"rt", lit(MIN)).as("ord"), $"rv".as("v"))).as("best"))
        .select($"lid", $"best.v")
        .as[(Long, String)].collect().toSeq.sorted

      val got = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("rv"))
        .select($"lid", $"rv")
        .as[(Long, String)].collect().toSeq.sorted
      assert(got === want, s"direct/null: iter=$iter")

      val gotBucketed = AsOfJoin.asOfBucketed(left, right, "k", "rk",
          "t", "rt", Seq("rv"), bucketUs = 2L)
        .select($"lid", $"rv")
        .as[(Long, String)].collect().toSeq.sorted
      assert(gotBucketed === want, s"bucketed/null: iter=$iter")
    }
  }
}
