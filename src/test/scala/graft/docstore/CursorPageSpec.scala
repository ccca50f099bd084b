package graft.docstore

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Keyset-cursor paging invariants (the proto's declared-next
  * `start_at`/`end_at`, db3_database_v2.proto:380-407), fuzzed over the
  * schemaless DocFuzz corpora (missing / null / type-mismatched keys —
  * the hard part of a cursor is a page boundary landing on a null or
  * absent key):
  *
  *  1. ZERO-DUP / ZERO-GAP: paging an entire corpus page-by-page —
  *     each page's `startAt` built from the previous page's last row
  *     (exclusive, full key tuple + `_id`) — reproduces the one-shot
  *     ordered run exactly, for random orderings (1–2 keys, mixed
  *     asc/desc, every key type).
  *  2. PARTITION: for a random boundary row, `startAt(exclusive)` and
  *     `endAt(inclusive)` split the corpus into two disjoint sets whose
  *     union is the whole corpus — no row is lost or double-counted at
  *     the boundary.
  *
  * Both run through `queryFused` (the production entry point); the
  * per-field/fused equivalence on cursor queries is separately fuzzed by
  * QueryFuzzSpec (genQuery now emits cursors).
  */
class CursorPageSpec extends SparkSpec {
  import DocFuzz._
  import FieldValue._

  private def genCorpus(seed: Long, n: Int): DocCollection = {
    val r = new Random(seed)
    val rows = (0L until n.toLong).map(i => (i, genDoc(r)))
    val df = spark.createDataFrame(rows).toDF("_id", "doc")
      .repartition(3).persist()
    df.count()
    DocCollection(s"cursor_$seed", df)
  }

  /** Typed key values per _id, driver-side, for building cursors the way
    * a paging client would (from the rows it just received). */
  private def keyValues(coll: DocCollection,
      orderKinds: Seq[(String, Kind)]): Map[Long, Seq[Option[FieldValue]]] = {
    val keyCols = orderKinds.zipWithIndex.map { case ((f, k), i) =>
      DocStore.fieldCol(col("doc"), f, witness(k)).as(s"k$i")
    }
    coll.df.select((col("_id") +: keyCols): _*).collect().map { row =>
      row.getLong(0) -> orderKinds.zipWithIndex.map { case ((_, k), i) =>
        if (row.isNullAt(i + 1)) None
        else Some[FieldValue](k match {
          case KI64 => I64(row.getLong(i + 1))
          case KDbl => Dbl(row.getDouble(i + 1))
          case KStr => Str(row.getString(i + 1))
          case KBool => Bool(row.getBoolean(i + 1))
        })
      }
    }.toMap
  }

  private def orderedIds(coll: DocCollection, q: StructuredQuery): Seq[Long] =
    DocStore.queryFused(coll, q).select("_id").collect().map(_.getLong(0)).toSeq

  test("paging a full corpus cursor-by-cursor is zero-dup zero-gap") {
    val r = new Random(20260815L)
    for (trial <- 0 until 12) {
      val coll = genCorpus(9100L + trial, 180)
      val orderKinds = r.shuffle(scalarFields).take(1 + r.nextInt(2))
      val orderBy = orderKinds.map { case (f, k) =>
        Order(f, desc = r.nextBoolean(), keyType = witness(k))
      }.toSeq
      val base = StructuredQuery(orderBy = orderBy)
      val full = orderedIds(coll, base)
      assert(full.size == 180, s"trial$trial: one-shot run lost rows")
      val keys = keyValues(coll, orderKinds)

      val pageSize = 1 + r.nextInt(23)
      val seen = ArrayBuffer.empty[Long]
      var cursor: Option[Cursor] = None
      var pages = 0
      while (pages == 0 || cursor.isDefined) {
        val page = orderedIds(coll,
          base.copy(limit = Some(pageSize), startAt = cursor))
        seen ++= page
        pages += 1
        cursor =
          if (page.size < pageSize) None // final short page
          else Some(Cursor(keys(page.last), id = Some(page.last),
            inclusive = false))
        assert(pages <= 180 / pageSize + 2, s"trial$trial: runaway paging")
      }
      assert(seen.toSeq == full,
        s"trial$trial: paged run diverged (order=$orderBy pageSize=$pageSize)")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("startAt(exclusive) and endAt(inclusive) partition the corpus at any row") {
    val r = new Random(31337L)
    val coll = genCorpus(777L, 150)
    for (trial <- 0 until 8) {
      val orderKinds = r.shuffle(scalarFields).take(1 + r.nextInt(2))
      val orderBy = orderKinds.map { case (f, k) =>
        Order(f, desc = r.nextBoolean(), keyType = witness(k))
      }.toSeq
      val base = StructuredQuery(orderBy = orderBy)
      val full = orderedIds(coll, base)
      val keys = keyValues(coll, orderKinds)
      val boundary = full(r.nextInt(full.size))
      val cut = keys(boundary)
      val before = orderedIds(coll,
        base.copy(endAt = Some(Cursor(cut, Some(boundary), inclusive = true))))
      val after = orderedIds(coll,
        base.copy(startAt = Some(Cursor(cut, Some(boundary), inclusive = false))))
      assert(before ++ after == full,
        s"trial$trial: boundary at _id=$boundary (order=$orderBy) is not a clean cut")
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
