package graft.analytics

import graft.SparkSpec

/** In-engine second oracle for the hand-decorrelated analytics queries
  * on the FIXTURE corpus: each case runs the literal correlated-subquery
  * SQL through Spark's own parser/optimizer and asserts row-for-row
  * equality with the DataFrame implementation (cases + rationale in
  * DecorrCases; DuckDB already checks the same SQL cross-engine).
  * DecorrFuzzSpec runs the identical cases over randomized corpora. */
class DecorrelationSpec extends SparkSpec {

  private lazy val views: Unit = graft.sources.Tables.registerAll(spark, sf)

  DecorrCases.all.foreach { c =>
    test(s"${c.name}: decorrelated impl == literal subquery SQL") {
      views
      DecorrCases.assertSame(spark, c, sf)
    }
  }
}
