package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate proof for `dedup_incremental`: the sf0.01 fixture's
  * batch slice happens to contain no duplicates (every flag 0), so the
  * driver's oracle there only proves the all-kept case. This spec builds
  * a corpus with one exact corpus dup, one batch-internal twin pair and
  * one near-dup of a corpus doc — with ids CHOSEN to land on the right
  * side of the operator's hash split — and asserts the exact verdict
  * per planted doc. */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("incremental dedup flags exactly the planted duplicates") {
    def inBatch(id: Long): Boolean = (id * 2246822519L) % 100 >= 80
    val corpusIds = (0L to 500L).filter(!inBatch(_)).take(2)
    val batchIds = (0L to 500L).filter(inBatch).take(5)
    val Seq(c0, c1) = corpusIds
    val Seq(b0, b1, b2, b3, b4) = batchIds

    val textA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 20).map(i => s"beta$i").mkString(" ")
    // near-dup of textC: drop the last word, append a fresh one
    val textC = (1 to 12).map(i => s"gamma$i").mkString(" ")
    val textCnear = ((1 to 11).map(i => s"gamma$i") :+ "delta").mkString(" ")
    val textD = (1 to 20).map(i => s"omega$i").mkString(" ")

    val docs = Seq(
      (c0, "en", "s", textA), // corpus original
      (c1, "en", "s", textC), // corpus near-dup target
      (b0, "en", "s", textA), // exact copy of corpus doc
      (b1, "en", "s", textB), // first of a batch twin pair
      (b2, "en", "s", textB), // second twin → exact_batch
      (b3, "en", "s", textCnear), // near-dup of c1
      (b4, "en", "s", textD)  // clean
    ).toDF("doc_id", "lang", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-inc").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = Dedup.dedupIncremental(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === Set(b0, b1, b2, b3, b4))
    // (exact_corpus, exact_batch, neardup_corpus, kept)
    assert(got(b0) === ((1L, 0L, 1L, 0L))) // identical text is also a near-dup
    assert(got(b1) === ((0L, 0L, 0L, 1L))) // smaller-id twin is the keeper
    assert(got(b2) === ((0L, 1L, 0L, 0L)))
    assert(got(b3) === ((0L, 0L, 1L, 0L)))
    assert(got(b4) === ((0L, 0L, 0L, 1L)))
  }
}
