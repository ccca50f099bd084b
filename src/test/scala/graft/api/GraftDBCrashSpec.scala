package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Crash-consistency proof for the manifest protocol — the zero-egress
  * stand-in for a Delta/Iceberg commit contract (BASELINE's declared
  * storage layer). Every write path follows data-first/commit-second:
  * data files land invisibly, then ONE atomic commit publishes them (the
  * state cell for appends, the manifest for snapshots and rollups, the
  * config cell for setup). Each test arms `GraftDB.failpoint` to throw
  * inside one crash window and proves the invariants:
  *   1. reads see the PRE-CRASH or POST-COMMIT state, never between;
  *   2. re-running the operation converges (idempotent under retry);
  *   3. the nonce cell is monotone (burned nonces never un-burn);
  *   4. manifests never duplicate rows under crash-retry.
  * (reference commit-point semantics: rollup_executor.rs:256 `process` —
  * write batches, add_rollup_record, then GC with add_gc_record;
  * mutation_store.rs:291,248.)
  */
class GraftDBCrashSpec extends SparkSpec {

  private class Boom extends RuntimeException("injected crash")

  private def freshDb(): GraftDB = {
    val dir = Files.createTempDirectory("graftcrash").toString
    new GraftDB(spark, dir)
  }

  private def arm(db: GraftDB, label: String): Unit =
    db.failpoint = l => if (l == label) throw new Boom

  private def disarm(db: GraftDB): Unit = db.failpoint = _ => ()

  private def liveDocs(db: GraftDB): Seq[(Long, String)] =
    db.collection("d", "c").df.orderBy("_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("addDocuments: crash between data append and state commit — orphan invisible, retry exactly-once") {
    val db = freshDb(); db.createCollection("d", "c")
    db.addDocuments("d", "c", Seq("""{"v":1}"""))
    arm(db, "addDocuments:afterAppend")
    intercept[Boom] {
      db.addDocuments("d", "c", Seq("""{"v":2}""", """{"v":3}"""))
    }
    disarm(db)
    // pre-crash state: the in-flight block is invisible (commit = cell)
    assert(liveDocs(db) === Seq((0L, """{"v":1}""")))
    // at-least-once retry: same ids come back, and the duplicate
    // (block, order) stamps in the log replay exactly once
    val ids = db.addDocuments("d", "c", Seq("""{"v":2}""", """{"v":3}"""))
    assert(ids === Seq(1L, 2L))
    assert(liveDocs(db) ===
      Seq((0L, """{"v":1}"""), (1L, """{"v":2}"""), (2L, """{"v":3}""")))
  }

  test("updateDocuments: crash before state commit leaves the doc at its previous value") {
    val db = freshDb(); db.createCollection("d", "c")
    val Seq(id) = db.addDocuments("d", "c", Seq("""{"a":1,"b":2}"""))
    arm(db, "updateDocuments:afterAppend")
    intercept[Boom] {
      db.updateDocuments("d", "c", Seq(id), Seq("""{"a":9}"""), Seq(Seq("a")))
    }
    disarm(db)
    assert(liveDocs(db) === Seq((0L, """{"a":1,"b":2}"""))) // pre-crash
    db.updateDocuments("d", "c", Seq(id), Seq("""{"a":9}"""), Seq(Seq("a")))
    val doc = liveDocs(db).head._2
    assert(doc.contains("\"a\":9") && doc.contains("\"b\":2")) // post-commit
  }

  test("appendDocumentsAt: crash after block write — invisible until commit, Overwrite retry idempotent") {
    import spark.implicits._
    val db = freshDb(); db.createCollection("d", "c")
    db.addDocuments("d", "c", Seq("""{"v":0}"""))
    val batch = Seq("""{"s":1}""", """{"s":2}""").toDF("doc")
    arm(db, "appendAt:afterData")
    intercept[Boom] { db.appendDocumentsAt("d", "c", 7L, batch) }
    disarm(db)
    assert(liveDocs(db).length === 1) // orphan block_7 invisible
    db.appendDocumentsAt("d", "c", 7L, batch) // the replayed micro-batch
    assert(liveDocs(db).length === 3)
    // exactly one copy of each (block, order) row in the visible log
    assert(db.mutationLog("d", "c")
      .groupBy("block", "order").count().filter(col("count") > 1).isEmpty)
  }

  test("snapshot: crash between state write and manifest append — unlisted, reads unaffected, retry lists once") {
    val db = freshDb(); db.createCollection("d", "c")
    db.addDocuments("d", "c", Seq("""{"v":1}""", """{"v":2}"""))
    val before = liveDocs(db)
    arm(db, "snapshot:afterData")
    intercept[Boom] { db.snapshot("d", "c") }
    disarm(db)
    assert(db.scanSnapshots("d", "c").isEmpty) // data orphaned, not published
    assert(liveDocs(db) === before)            // fold unaffected
    val (blk, n) = db.snapshot("d", "c")       // retry overwrites + publishes
    assert(n === 2L)
    assert(db.scanSnapshots("d", "c").count() === 1)
    assert(liveDocs(db) === before)            // snapshot-seeded fold agrees
    assert(db.collectionAt("d", "c", blk).df.count() === 2)
  }

  test("rollup: crash after batch write, before manifest — tail intact, retry rolls once") {
    val db = freshDb(); db.createCollection("d", "c")
    db.addDocuments("d", "c", Seq("""{"v":1}"""))
    db.addDocuments("d", "c", Seq("""{"v":2}"""))
    val before = liveDocs(db)
    arm(db, "rollup:afterData")
    intercept[Boom] { db.rollup("d", "c") }
    disarm(db)
    assert(db.scanRollupRecords("d", "c").isEmpty) // nothing committed
    assert(db.tailBytes("d", "c") > 0)             // tail untouched
    assert(liveDocs(db) === before)
    val recs = db.rollup("d", "c")                 // retry
    assert(recs.nonEmpty)
    assert(db.scanRollupRecords("d", "c").count() === recs.length.toLong)
    assert(db.tailBytes("d", "c") === 0L)
    assert(liveDocs(db) === before)
  }

  test("rollup: crash after manifest, before GC — no double-visibility, re-entry finishes the GC") {
    val db = freshDb(); db.createCollection("d", "c")
    db.addDocuments("d", "c", Seq("""{"v":1}""", """{"v":2}"""))
    db.deleteDocuments("d", "c", Seq(1L))
    val before = liveDocs(db)
    val committedLog = db.mutationLog("d", "c").count()
    arm(db, "rollup:afterManifest")
    intercept[Boom] { db.rollup("d", "c") }
    disarm(db)
    // blocks now live in BOTH the committed batches and the un-GC'd tail,
    // but the manifest bound keeps the tail copy invisible
    assert(db.scanRollupRecords("d", "c").count() > 0)
    assert(db.tailBytes("d", "c") > 0)
    assert(db.mutationLog("d", "c").count() === committedLog)
    assert(liveDocs(db) === before)
    val manifestRows = db.scanRollupRecords("d", "c").count()
    val recs = db.rollup("d", "c") // re-entry: GC only, no re-roll
    assert(recs.isEmpty)
    assert(db.scanRollupRecords("d", "c").count() === manifestRows) // no dupes
    assert(db.scanGcRecords("d", "c").count() === 1)
    assert(db.tailBytes("d", "c") === 0L)
    assert(liveDocs(db) === before)
  }

  test("rollup: crash after GC record, before tail delete — no duplicate GcRecord on re-entry") {
    val db = freshDb(); db.createCollection("d", "c")
    db.addDocuments("d", "c", Seq("""{"v":1}"""))
    db.addDocuments("d", "c", Seq("""{"v":2}"""))
    val before = liveDocs(db)
    arm(db, "rollup:afterGc")
    intercept[Boom] { db.rollup("d", "c") }
    disarm(db)
    assert(db.scanGcRecords("d", "c").count() === 1) // record committed
    assert(db.tailBytes("d", "c") > 0)               // delete didn't run
    assert(liveDocs(db) === before)
    db.rollup("d", "c") // re-entry: finishes the delete, skips the append
    assert(db.scanGcRecords("d", "c").count() === 1) // still exactly one
    assert(db.tailBytes("d", "c") === 0L)
    assert(liveDocs(db) === before)
  }

  test("setup: crash after nonce burn, before config write — config atomic, nonce monotone, replay dead") {
    val db = freshDb()
    def req(cfg: String, nonce: Long): (String, String) = {
      import graft.functions.crypto.Keccak256
      val hex = Keccak256.hexLower(cfg.getBytes("UTF-8"))
      val td = s"""{"types":{"EIP712Domain":[],"Message":[{"name":"payload","type":"bytes"},{"name":"nonce","type":"string"}]},"domain":{},"primaryType":"Message","message":{"payload":"0x$hex","nonce":"$nonce"}}"""
      (td, graft.functions.crypto.Eip712.signOrNull(td, 1L).toString)
    }
    val (td1, sig1) = req("""{"networkId":7}""", 1L)
    arm(db, "setup:afterNonce")
    intercept[Boom] { db.setup(td1, sig1) }
    disarm(db)
    // config stayed atomically at its previous (unset) value
    assert(!db.systemStatus().hasInited)
    assert(db.systemStatus().config.networkId === 0L)
    // the nonce burned — monotone cell, replay of the crashed request is
    // dead on arrival (chain semantics: a consumed nonce never un-burns)
    val admin = graft.functions.crypto.Secp256k1.privToAddress(BigInt(1))
    assert(db.getNonce(admin) === 2L)
    intercept[IllegalArgumentException] { db.setup(td1, sig1) }
    // the client retries with the NEXT nonce and the config applies
    val (td2, sig2) = req("""{"networkId":7}""", 2L)
    db.setup(td2, sig2)
    assert(db.systemStatus().hasInited)
    assert(db.systemStatus().config.networkId === 7L)
    assert(db.getNonce(admin) === 3L)
  }
}
