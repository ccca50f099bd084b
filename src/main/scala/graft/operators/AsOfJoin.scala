package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — the time-series staple the reference's event tables imply
  * (latest dimension row at or before each event's timestamp).
  *
  * Composed from built-ins (preference (a) of the custom-operator ladder):
  * tag and union both sides, one window per key ordered by (t, side),
  * `last(..., ignoreNulls)` carries the most recent right-side row forward,
  * left rows then read their match from the running state. One shuffle on
  * the key, linear scan per partition — the textbook distributed as-of
  * shape (no per-row range probe, no broadcast of the big side).
  */
object AsOfJoin {

  /** Inner as-of: for each left row, the right row with the greatest
    * `rightTime <= leftTime` within the same key. `rightCols` are carried
    * onto matched left rows. Right side must be unique per (key, time) —
    * pre-dedupe for deterministic results. */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal t => inclusive (<=) match
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"__m_$c", last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    val matched = carried.filter(col("__side") === 1)
      .filter(col(s"__m_${rightCols.head}").isNotNull)
    val out = left.columns.map(col) ++
      rightCols.map(c => col(s"__m_$c").as(c))
    matched.select(out.toIndexedSeq: _*)
  }
}
