package graft.docstore

import graft.SparkSpec
import scala.util.Random

/** Property-fuzz of the two StructuredQuery compilers against each other:
  * random document corpora (nested / flat / missing / null /
  * type-mismatched fields) × random query trees (all 9 ops × and/or
  * nesting × order/offset/limit × projection) must produce IDENTICAL
  * result sets through `DocStore.query` (per-field `get_json_object`
  * probes) and `DocStore.queryFusedAlways` (single `from_json` behind the
  * parse fence). The fused compiler is the core query surface — this
  * pins its nested schemas, branchy-prefix fallback and explode fence
  * against the per-field reference implementation, which is itself
  * oracle-anchored by the 23 driver doc queries (DuckDB exact-hash at
  * sf0.01/sf0.1). Generator + representational caveats: `DocFuzz`.
  */
class QueryFuzzSpec extends SparkSpec {
  import DocFuzz._

  private def genCorpus(seed: Long, n: Int): DocCollection = {
    val r = new Random(seed)
    val rows = (0L until n.toLong).map(i => (i, genDoc(r)))
    val df = spark.createDataFrame(rows).toDF("_id", "doc")
      .repartition(2).persist()
    df.count() // materialize once; ~n tiny rows
    DocCollection(s"fuzz_$seed", df)
  }

  private def checkCase(coll: DocCollection, q: StructuredQuery, tag: String,
      checkDispatch: Boolean): Unit = {
    val perField = canon(DocStore.query(coll, q))
    val fused = canon(DocStore.queryFusedAlways(coll, q))
    assert(fused._1 === perField._1, s"schema diverged [$tag]: $q")
    assert(fused._2 === perField._2, s"rows diverged [$tag]: $q")
    if (checkDispatch) {
      // the dispatching entry point (fast path or fence) must agree too
      val dispatched = canon(DocStore.queryFused(coll, q))
      assert(dispatched._2 === perField._2, s"dispatch diverged [$tag]: $q")
    }
  }

  test("fused and per-field compilers agree on 1200 random (corpus, query) cases") {
    val corpora = IndexedSeq(11L, 22L, 33L).map(s => genCorpus(20260813L + s, 160))
    val r = new Random(8L)
    for (i <- 0 until 1200) {
      val q = genQuery(r)
      checkCase(corpora(i % 3), q, s"case$i", checkDispatch = i % 8 == 0)
    }
  }
}
