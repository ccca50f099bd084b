package graft.api

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec
import graft.docstore._

/** Property-fuzz of index-aware execution against plain execution over a
  * REAL mutation log: `queryWithIndex` (sorted-index probe → id push /
  * semi-join fallback → residual filters) must return exactly what
  * `query` (full-scan compiler) returns, for random query trees over a
  * log that mixes adds across blocks, masked updates and tombstones, with
  * indexes on flat and nested paths of every key type. `QueryFuzzSpec`
  * pins the two scan compilers against each other; this pins the third
  * execution path — the index planner — against them. Generator:
  * `DocFuzz`.
  */
class GraftDBFuzzSpec extends SparkSpec {
  import DocFuzz._
  import FieldValue._

  private def buildDb(seed: Long): (GraftDB, String, String) = {
    val r = new Random(seed)
    val root = Files.createTempDirectory("graftdb_fuzz").toString
    val db = new GraftDB(spark, root)
    val (d, c) = ("d1", "c")
    db.createCollection(d, c)
    // three add blocks — ids span files, so index lookups cross blocks
    val ids = (0 until 3).flatMap(_ =>
      db.addDocuments(d, c, Seq.fill(60)(genDoc(r))))
    // whole-doc replaces land updated ids in a LATER block (non-disjoint
    // id ranges: the pruning comment's update case)
    val upd = r.shuffle(ids).take(25)
    db.updateDocuments(d, c, upd, upd.map(_ => genDoc(r)), upd.map(_ => Nil))
    // and a few masked updates: only field `a` is patched
    val masked = r.shuffle(ids).take(8)
    db.updateDocuments(d, c, masked,
      masked.map(_ => s"""{"a":${r.nextInt(60)}}"""), masked.map(_ => Seq("a")))
    db.deleteDocuments(d, c, r.shuffle(ids).take(12))
    // indexes AFTER all mutations (the materialized-index contract);
    // every kind: long / double / string / nested long
    db.addIndex(d, c, "a", "Int64Key")
    db.addIndex(d, c, "b", "DoubleKey")
    db.addIndex(d, c, "s", "StringKey")
    db.addIndex(d, c, "m.x", "Int64Key")
    (db, d, c)
  }

  /** Half the queries get an indexable leading conjunct grafted on, so
    * the indexed branch (not just its fallback) is exercised densely. */
  private def genIndexedQuery(r: Random): StructuredQuery = {
    val q = genQuery(r)
    if (r.nextBoolean()) q
    else {
      val (f, k) = Vector("a" -> KI64, "b" -> KDbl, "s" -> KStr,
        "m.x" -> KI64)(r.nextInt(4))
      val op = Vector(Op.Eq, Op.Neq, Op.Lt, Op.Le, Op.Gt, Op.Ge)(r.nextInt(6))
      val leaf = FieldFilter(f, op, genValue(k, r))
      val where = q.where match {
        case Some(AndFilter(fs)) => AndFilter(leaf +: fs)
        case Some(w) => AndFilter(Vector(leaf, w))
        case None => leaf
      }
      q.copy(where = Some(where))
    }
  }

  test("queryWithIndex and query agree on 400 random cases over a mutated log") {
    val (db, d, c) = buildDb(20260813L)
    val r = new Random(88L)
    for (i <- 0 until 400) {
      val q = genIndexedQuery(r)
      val plain = canon(db.query(d, c, q))
      val indexed = canon(db.queryWithIndex(d, c, q))
      assert(indexed._1 === plain._1, s"schema diverged [case$i]: $q")
      assert(indexed._2 === plain._2, s"rows diverged [case$i]: $q")
    }
  }
}
