package graft.pipeline

import graft.SparkSpec

/** Runtime plan pin for the bigram LM — asserted on the FINAL adaptive
  * plan (after execution), because the property that matters at 100 TB is
  * what actually ran, not the initial static plan.
  */
class BigramPlanSpec extends SparkSpec {

  test("text_bigram_lm: two corpus passes (stats + score), window only over the aggregated table") {
    val df = TextOps.textBigramLm(spark, sf)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), full)
    // strip the "== Initial Plan ==" echo; pin only what executed
    val fin = full.split("== Initial Plan ==")(0)
    // stats-then-score is inherently two-pass (the DSIR precedent); a
    // third scan means the prefix-count rollup regressed to its own
    // corpus tokenize (a checkpointed one-pass variant was measured
    // SLOWER in r15 — see textBigramLm's doc)
    assert(fin.linesIterator.count(_.contains("FileScan parquet")) === 2, fin)
    // the n1 window partitions by the bigram prefix over the AGGREGATED
    // vocab-squared table — the corpus itself must never enter a Window
    val winLines = fin.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, fin)
    assert(fin.linesIterator.count(_.contains("Sort ")) === 1, fin)
    // shuffle budget: 2x per-doc-bigram partials, bigram counts, the
    // prefix window, the final per-doc fold — and nothing else
    val shuffles = fin.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 5, fin)
    // both scans read only (doc_id, text) — column pruning held
    fin.linesIterator.filter(_.contains("FileScan parquet")).foreach { l =>
      assert(l.contains("ReadSchema: struct<doc_id:bigint,text:string>"), l)
    }
  }
}
