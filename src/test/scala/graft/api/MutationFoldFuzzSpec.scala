package graft.api

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** State-machine fuzz of the mutation fold: random add / masked-update /
  * whole-replace / delete / re-add streams are applied BOTH through the
  * GraftDB log (distributed groupByKey replay, snapshot-seeded or not,
  * rollup-compacted or not) and through a driver-side reference map that
  * applies the documented semantics directly (update on absent or
  * tombstoned id is a no-op; mask fields replace, mask-listed-but-absent
  * fields delete, empty mask = whole replace; delete tombstones; re-add
  * revives). The two must agree doc-for-doc at every checkpoint — with
  * snapshots and rollups interleaved at random, so the seeded-fold and
  * compacted-log read paths face the same stream as the plain fold.
  * `QueryFuzzSpec`/`GraftDBFuzzSpec` pin the three QUERY paths against
  * each other; this pins the WRITE path's fold, which they all read
  * through. Masked merges in the reference model reuse
  * `GraftDB.mergeMasked` itself — the fuzz target is the distributed
  * fold (ordering, grouping, snapshot seeding, rollup compaction), not
  * the JSON merge arithmetic, which has its own direct specs.
  */
class MutationFoldFuzzSpec extends SparkSpec {

  private val FieldPool = Vector("a", "b", "c", "d")

  private def randomDoc(r: Random): String = {
    val n = 1 + r.nextInt(FieldPool.length)
    val fields = r.shuffle(FieldPool).take(n).sorted.map { f =>
      if (r.nextBoolean()) s""""$f":${r.nextInt(100)}"""
      else s""""$f":"s${r.nextInt(10)}""""
    }
    fields.mkString("{", ",", "}")
  }

  private def foldedState(db: GraftDB): Map[Long, String] =
    db.collection("d1", "c").df.collect()
      .map(row => row.getLong(0) -> row.getString(1)).toMap

  private def canon(doc: String): String = {
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(JsonMethods.parse(doc)))
  }

  test("distributed fold == reference state machine on 6 random mutation streams") {
    for (seed <- 1 to 6) {
      val r = new Random(9200 + seed)
      val root = Files.createTempDirectory("graft_fold_fuzz").toString
      val db = new GraftDB(spark, root)
      db.createCollection("d1", "c")
      var ref = Map.empty[Long, String]
      var knownIds = Vector.empty[Long] // includes tombstoned ids (re-add targets update path)
      val steps = 18 + r.nextInt(10)
      for (step <- 1 to steps) {
        r.nextInt(10) match {
          case 0 | 1 | 2 => // add 1-4 docs
            val docs = (0 until 1 + r.nextInt(4)).map(_ => randomDoc(r))
            val ids = db.addDocuments("d1", "c", docs)
            ref ++= ids.zip(docs)
            knownIds ++= ids
          case 3 | 4 | 5 if knownIds.nonEmpty => // masked or whole update
            val n = 1 + r.nextInt(3)
            val ids = (0 until n).map(_ => knownIds(r.nextInt(knownIds.length)))
            val docs = ids.map(_ => randomDoc(r))
            val masks = ids.map { _ =>
              if (r.nextInt(3) == 0) Seq.empty[String] // whole replace
              else r.shuffle(FieldPool).take(1 + r.nextInt(3)).toSeq
            }
            db.updateDocuments("d1", "c", ids, docs, masks)
            ids.indices.foreach { i =>
              ref.get(ids(i)).foreach { base => // absent/tombstoned: no-op
                ref += ids(i) -> GraftDB.mergeMasked(base, docs(i),
                  if (masks(i).isEmpty) None else Some(masks(i).mkString(",")))
              }
            }
          case 6 | 7 if knownIds.nonEmpty => // delete (possibly already dead)
            val ids = (0 until 1 + r.nextInt(2))
              .map(_ => knownIds(r.nextInt(knownIds.length))).distinct
            db.deleteDocuments("d1", "c", ids)
            ref --= ids
          case 8 => // snapshot: later folds seed from it
            db.snapshot("d1", "c")
          case _ => // rollup: compacts the tail into batches
            db.rollup("d1", "c", maxBatchBytes = 1024)
        }
        if (step % 7 == 0 || step == steps) {
          val got = foldedState(db)
          assert(got.keySet === ref.keySet,
            s"seed=$seed step=$step ids: got=${got.keySet} want=${ref.keySet}")
          got.foreach { case (id, doc) =>
            assert(canon(doc) === canon(ref(id)), s"seed=$seed step=$step id=$id")
          }
        }
      }
    }
  }
}
