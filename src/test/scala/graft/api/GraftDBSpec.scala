package graft.api

import graft.SparkSpec
import graft.docstore.{FieldFilter, FieldValue, Op, StructuredQuery}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GraftDBSpec extends SparkSpec {

  private def freshDb(): GraftDB = {
    val dir = Files.createTempDirectory("graftdb").toString
    new GraftDB(spark, dir)
  }

  test("add → query round trip") {
    val db = freshDb()
    db.createCollection("d1", "books")
    val ids = db.addDocuments("d1", "books", Seq(
      """{"title":"Dune","rate":5}""",
      """{"title":"Foundation","rate":4}""",
      """{"title":"Hyperion","rate":5}"""))
    assert(ids === Seq(0L, 1L, 2L))
    val fives = db.query("d1", "books", StructuredQuery(
      where = Some(FieldFilter("rate", Op.Eq, FieldValue.I64(5))),
      select = Seq("title")))
    assert(fives.select("title").collect().map(_.getString(0)).sorted
      === Array("Dune", "Hyperion"))
  }

  test("masked update merges only masked fields; absent masked field deletes") {
    val db = freshDb()
    db.createCollection("d1", "c")
    val Seq(id) = db.addDocuments("d1", "c", Seq("""{"a":1,"b":2,"c":3}"""))
    db.updateDocuments("d1", "c", Seq(id), Seq("""{"a":10}"""), Seq(Seq("a", "c")))
    val doc = db.collection("d1", "c").df.filter(col("_id") === id)
      .select("doc").head().getString(0)
    val parsed = org.json4s.jackson.JsonMethods.parse(doc)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((parsed \ "a").extract[Int] === 10) // masked, replaced
    assert((parsed \ "b").extract[Int] === 2)  // unmasked, untouched
    assert((parsed \ "c") === JNothing)        // masked but absent -> deleted
  }

  test("unmasked update replaces whole doc; delete tombstones") {
    val db = freshDb()
    db.createCollection("d1", "c")
    val ids = db.addDocuments("d1", "c", Seq("""{"x":1}""", """{"x":2}"""))
    db.updateDocuments("d1", "c", Seq(ids.head), Seq("""{"y":9}"""), Seq(Nil))
    db.deleteDocuments("d1", "c", Seq(ids(1)))
    val live = db.collection("d1", "c").df.collect()
    assert(live.length === 1)
    assert(live.head.getLong(0) === ids.head)
    assert(live.head.getString(1) === """{"y":9}""")
  }

  test("re-add after delete revives the id") {
    val db = freshDb()
    db.createCollection("d1", "c")
    val Seq(id) = db.addDocuments("d1", "c", Seq("""{"v":1}"""))
    db.deleteDocuments("d1", "c", Seq(id))
    assert(db.collection("d1", "c").df.count() === 0)
    db.addDocuments("d1", "c", Seq("""{"v":2}"""))
    assert(db.collection("d1", "c").df.count() === 1)
  }

  test("time-travel read returns state as of an earlier block") {
    val db = freshDb()
    db.createCollection("d1", "c")
    val Seq(id) = db.addDocuments("d1", "c", Seq("""{"v":1}"""))    // block 0
    db.updateDocuments("d1", "c", Seq(id), Seq("""{"v":2}"""), Seq(Nil)) // block 1
    db.deleteDocuments("d1", "c", Seq(id))                          // block 2
    def docAt(b: Long) = db.collectionAt("d1", "c", b).df.collect()
    assert(docAt(0).map(_.getString(1)).toSeq === Seq("""{"v":1}"""))
    assert(docAt(1).map(_.getString(1)).toSeq === Seq("""{"v":2}"""))
    assert(docAt(2).isEmpty)
  }

  test("json ingestion and export round trip") {
    val db = freshDb()
    db.createCollection("d1", "c")
    val in = Files.createTempDirectory("graft-in")
    Files.writeString(in.resolve("docs.ndjson"),
      "{\"a\":1}\n{\"a\":2}\n\n{\"a\":3}\n")
    val n = db.addDocumentsFromJson("d1", "c", in.resolve("docs.ndjson").toString)
    assert(n === 3)
    val out = Files.createTempDirectory("graft-out").resolve("dump").toString
    db.export("d1", "c", out, "json")
    val back = spark.read.json(out)
    assert(back.count() === 3)
  }

  test("addIndex materializes a sorted typed key projection") {
    val db = freshDb()
    db.createCollection("d1", "c")
    db.addDocuments("d1", "c", Seq(
      """{"rate":5,"t":"a"}""", """{"rate":3,"t":"b"}""", """{"t":"c"}"""))
    db.addIndex("d1", "c", "rate", "Int64Key")
    val idx = db.index("d1", "c", "rate").collect()
    assert(idx.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((3L, 1L), (5L, 0L)))
  }

  test("index-aware query equals plain query and prunes via the index") {
    import graft.docstore._
    import graft.docstore.FieldValue._
    val db = freshDb()
    db.createCollection("d1", "c")
    db.addDocuments("d1", "c", (0 until 100).map(i =>
      s"""{"rate":${i % 10},"tag":"t${i % 3}"}"""))
    db.addIndex("d1", "c", "rate", "Int64Key")
    val q = StructuredQuery(where = Some(AndFilter(Seq(
      FieldFilter("rate", Op.Ge, I64(7)),
      FieldFilter("tag", Op.Eq, Str("t1"))))))
    val plain = db.query("d1", "c", q)
    val viaIdx = db.queryWithIndex("d1", "c", q)
    assert(viaIdx.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(viaIdx).count() === 0)
    assert(viaIdx.count() > 0)
    // the index path pushes the key predicate into the index scan
    val plan = viaIdx.queryExecution.executedPlan.toString
    assert(plan.contains("idx_key"))
    // unindexed field falls back to the fused compiler
    val q2 = StructuredQuery(where = Some(FieldFilter("tag", Op.Eq, Str("t2"))))
    assert(db.queryWithIndex("d1", "c", q2).count() === db.query("d1", "c", q2).count())
  }

  test("metadata listings mirror db/collection layout") {
    val db = freshDb()
    db.createCollection("d1", "books")
    db.createCollection("d1", "authors")
    db.createCollection("d2", "events")
    assert(db.listDatabases() === Seq("d1", "d2"))
    assert(db.listCollections("d1") === Seq("authors", "books"))
    db.addDocuments("d1", "books", Seq("""{"x":1}""", """{"x":2}"""))
    assert(db.collectionState("d1", "books") === 2)
    assert(db.collectionState("d1", "authors") === 0)
  }

  test("rollup compacts the tail, GCs it, and state survives recovery") {
    val db = freshDb()
    db.createCollection("d1", "c")
    db.addDocuments("d1", "c", (1 to 50).map(i => s"""{"n":$i}"""))
    db.updateDocuments("d1", "c", Seq(0L), Seq("""{"n":100}"""), Seq(Nil))
    db.deleteDocuments("d1", "c", Seq(1L))
    val before = db.collection("d1", "c").df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rec = db.rollup("d1", "c")
    assert(rec.mutationCount === 52)
    assert(rec.compressedBytes > 0)
    val after = db.recover("d1", "c").df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === before)
    assert(after(0L) === """{"n":100}""" && !after.contains(1L) && after.size === 49)
    // appends continue after rollup with fresh blocks
    db.addDocuments("d1", "c", Seq("""{"n":999}"""))
    assert(db.collection("d1", "c").df.count() === 50)
  }
}
