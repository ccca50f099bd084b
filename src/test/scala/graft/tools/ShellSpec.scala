package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import graft.api.GraftDB

/** The console client's command set, driven through the same lifecycle
  * the reference's shell exercises (cmd/src/command.rs:41): create →
  * add → filtered show → masked update → delete → index → rollup →
  * state, all via `Shell.execute` (the REPL's testable core). */
class ShellSpec extends SparkSpec {

  test("console lifecycle: create, add, query, update, delete, rollup, state") {
    val root = Files.createTempDirectory("graft-shell").toString
    val db = new GraftDB(spark, root)
    def run(cmd: String): String = Shell.execute(db, root, cmd)

    assert(run("show-db") === "(no databases)")
    assert(run("new-collection d1 books") === "created d1/books")
    assert(run("show-db") === "d1")

    assert(run("""new-doc d1 books {"title":"dune","rate":5}""") === "id 0")
    assert(run("""new-doc d1 books {"title":"tron","rate":3}""") === "id 1")
    assert(run("show-collection d1") === "books\t2 docs")

    // EJDB-style filter + limit through the SDK query-string surface
    val hi = run("""show-doc d1 books /[rate = 5] 10""")
    assert(hi.contains("dune") && !hi.contains("tron"))
    assert(run("show-doc d1 books").linesIterator.size === 2)

    // masked update: only `rate` changes
    assert(run("""update-doc d1 books 1 {"rate":4,"title":"x"} rate""")
      === "updated 1 mask=rate")
    val doc1 = run("get-doc d1 books 1")
    assert(doc1.contains("tron") && doc1.contains("4"))
    // whole-doc update (no mask)
    assert(run("""update-doc d1 books 1 {"title":"tron2","rate":2}""") === "updated 1")
    assert(run("get-doc d1 books 1").contains("tron2"))

    assert(run("del-doc d1 books 1") === "deleted 1")
    assert(run("get-doc d1 books 1") === "(not found)")

    assert(run("new-index d1 books rate Int64Key") === "indexed rate (Int64Key)")
    assert(run("rollup d1 books").startsWith("blocks 0.."))
    val st = run("show-state d1 books")
    assert(st.contains("rollups 1") && st.contains("last block"))
    assert(run("snapshot d1 books").startsWith("snapshot at block"))
    assert(run("show-account 0xabc") === "next nonce 1")
    assert(run("bogus").startsWith("unknown command"))
    assert(run("help").contains("show-doc"))

    // keystore + the SIGNED write path (the reference client's real
    // send: sign with the stored key, auto-nonce, sender recovered)
    assert(run("show-key") === "(no keystore — run 'init')")
    val created = run("init")
    assert(created.startsWith("keystore created (address 0x"))
    val addr = run("show-key")
    assert(addr.startsWith("0x") && created.contains(addr))
    assert(run("init").startsWith("keystore exists"))
    val sent = run("""send-mutation d1 books {"title":"signed1"} ;; {"title":"signed2"}""")
    assert(sent.startsWith(s"sender $addr ids "))
    val ids = sent.split(" ids ")(1).split(",").map(_.toLong)
    assert(ids.length === 2)
    assert(run(s"get-doc d1 books ${ids(0)}").contains("signed1"))
    assert(run(s"get-doc d1 books ${ids(1)}").contains("signed2"))
    // nonce consumed: the sender's next nonce advanced
    assert(run(s"show-account $addr") === "next nonce 2")
  }
}
