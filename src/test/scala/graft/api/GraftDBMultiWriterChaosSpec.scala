package graft.api

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-writer crash-retry chaos — the composition of
  * GraftDBConcurrencySpec (races without crashes) and GraftDBChaosSpec
  * (crashes without races): TWO GraftDB instances, one per thread, each
  * driving its own random op stream (add / masked update / delete /
  * snapshot / rollup) where any op may crash at a randomly chosen armed
  * failpoint mid-critical-section and then retry. This is the corner
  * the reference's single-sequencer contract (mutation_store.rs:444)
  * leaves to the store: a writer that dies between its data append and
  * its state commit RELEASES the collection lock with uncommitted rows
  * at block N on disk, and the next writer to stamp N must not let that
  * orphan ride its commit (same (block, order), different content —
  * per-attempt blk_ dirs + the under-lock orphan sweep close it).
  *
  * Reference model: each writer records the ids RETURNED by its
  * successful (retried) ops and mutates ONLY its own docs, so the final
  * value of every doc is a pure function of that writer's sequential
  * stream — interleavings move id assignment around but never the
  * folded content. Invariants at the end of every seed: fold == merged
  * models (ids AND canonical docs), one batch per block with dense
  * blocks, rollup manifest ranges disjoint with every dir present, and
  * a fresh-instance reread (recovery) agreeing. */
class GraftDBMultiWriterChaosSpec extends SparkSpec {

  private class Boom extends RuntimeException("injected crash")

  private def canon(doc: String): String = {
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(JsonMethods.parse(doc)))
  }

  test("two crashing writers converge to the merged per-writer models (4 seeds)") {
    for (seed <- 1 to 4) {
      val root = Files.createTempDirectory("graft_mwchaos").toString
      val setupDb = new GraftDB(spark, root)
      setupDb.createCollection("d1", "c")
      val crashes = new java.util.concurrent.atomic.AtomicInteger(0)
      val models = Array.fill(2)(scala.collection.mutable.Map.empty[Long, String])

      def writer(w: Int): Unit = {
        val db = new GraftDB(spark, root) // own instance, own failpoint
        val r = new Random(52000 + seed * 10 + w)
        val ref = models(w)
        var mine = Vector.empty[Long]

        /** Run `op` with ~40% probability of first running it once with
          * a random window armed. A crashed attempt must contribute
          * nothing beyond its retry; an armed run that never reaches
          * the failpoint (rollup's no-op early return) IS the result. */
        def chaotic[T](windows: Seq[String])(op: => T): T = {
          if (r.nextInt(10) < 4) {
            val wnd = windows(r.nextInt(windows.length))
            db.failpoint = l => if (l == wnd) throw new Boom
            val armed =
              try Right(op)
              catch { case _: Boom => Left(()) }
            db.failpoint = _ => ()
            armed match {
              case Right(result) => return result
              case Left(_)       => crashes.incrementAndGet()
            }
          }
          op
        }

        val steps = 12 + r.nextInt(6)
        for (_ <- 1 to steps) {
          r.nextInt(10) match {
            case 0 | 1 | 2 | 3 => // add 1-2 docs
              val docs = (0 until 1 + r.nextInt(2))
                .map(i => s"""{"w":$w,"v":${r.nextInt(100)},"i":$i}""")
              val ids = chaotic(Seq("addDocuments:afterAppend")) {
                db.addDocuments("d1", "c", docs)
              }
              ref.synchronized { ref ++= ids.zip(docs) }
              mine ++= ids
            case 4 | 5 if mine.nonEmpty => // masked or whole update of OWN doc
              val id = mine(r.nextInt(mine.length))
              val doc = s"""{"v":${r.nextInt(100)},"u":$w}"""
              val mask = if (r.nextInt(3) == 0) Seq.empty[String] else Seq("v")
              chaotic(Seq("updateDocuments:afterAppend")) {
                db.updateDocuments("d1", "c", Seq(id), Seq(doc), Seq(mask))
              }
              ref.synchronized {
                ref.get(id).foreach { base =>
                  ref(id) = GraftDB.mergeMasked(base, doc,
                    if (mask.isEmpty) None else Some(mask.mkString(",")))
                }
              }
            case 6 if mine.nonEmpty => // delete OWN doc
              val id = mine(r.nextInt(mine.length))
              chaotic(Seq("deleteDocuments:afterAppend")) {
                db.deleteDocuments("d1", "c", Seq(id))
              }
              ref.synchronized { ref -= id }
            case 7 => // snapshot: later folds seed from it
              chaotic(Seq("snapshot:afterData")) { db.snapshot("d1", "c") }
            case _ =>
              chaotic(Seq("rollup:afterData", "rollup:afterManifest",
                "rollup:afterGc")) {
                db.rollup("d1", "c", maxBatchBytes = 512)
              }
          }
        }
      }

      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val fails = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until 2).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try writer(w) catch { case t: Throwable => fails.add(t) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(240, TimeUnit.SECONDS),
        s"seed=$seed writers timed out")
      if (!fails.isEmpty) throw fails.peek()

      val want = (models(0) ++ models(1)).toMap
      val got = setupDb.collection("d1", "c").df.collect()
        .map(row => row.getLong(0) -> row.getString(1)).toMap
      assert(got.keySet === want.keySet,
        s"seed=$seed crashes=${crashes.get()}: got=${got.keySet.toSeq.sorted} " +
          s"want=${want.keySet.toSeq.sorted}")
      got.foreach { case (id, doc) =>
        assert(canon(doc) === canon(want(id)), s"seed=$seed id=$id")
      }

      // block-protocol invariants: committed blocks dense 0..lastBlock,
      // exactly one batch's stamps per block (no torn/mixed blocks)
      val log = setupDb.mutationLog("d1", "c")
        .filter(col("block") <= setupDb.nextBlockId("d1", "c") - 1)
      val blocks = log.select("block").distinct()
        .as[Long](spark.implicits.newLongEncoder).collect().sorted
      assert(blocks.toSeq === (0L to blocks.max),
        s"seed=$seed blocks not dense: ${blocks.mkString(",")}")
      val dupStamps = log.groupBy(col("block"), col("order"))
        .count().filter(col("count") > 1).count()
      assert(dupStamps === 0L, s"seed=$seed duplicate (block, order) stamps")

      // manifest invariants + recovery reread on a FRESH instance
      val recs = setupDb.scanRollupRecords("d1", "c")
        .select("start_block", "end_block", "path").collect()
        .map(rw => (rw.getLong(0), rw.getLong(1), rw.getString(2)))
        .sortBy(_._1)
      recs.sliding(2).foreach {
        case Array((_, hi, _), (lo2, _, _)) =>
          assert(hi < lo2, s"seed=$seed overlapping rollup ranges")
        case _ =>
      }
      recs.foreach { case (_, _, p) =>
        assert(new java.io.File(p).isDirectory, s"seed=$seed missing $p")
      }
      setupDb.rollup("d1", "c", maxBatchBytes = 512)
      val db2 = new GraftDB(spark, root)
      val after = db2.collection("d1", "c").df.collect()
        .map(row => row.getLong(0) -> row.getString(1)).toMap
      assert(after.keySet === want.keySet, s"seed=$seed post-rollup reread")
      after.foreach { case (id, doc) =>
        assert(canon(doc) === canon(want(id)), s"seed=$seed post-rollup id=$id")
      }
    }
  }
}
