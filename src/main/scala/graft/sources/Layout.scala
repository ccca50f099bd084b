package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout writer — the multi-dimensional analog of
  * Bucketing's single-key locality. A sort on one column gives perfect
  * row-group pruning on that column and none on any other; interleaving
  * the bits of TWO dimensions' bucket ranks and range-sorting on the
  * interleaved value clusters rows so every file covers a small rectangle
  * of (x, y) space — parquet min/max stats then prune scans filtered on
  * EITHER or BOTH dimensions. At 100 TB this is the difference between a
  * time-AND-key query reading a few files and reading the whole corpus.
  * (Same mechanism as Delta/Iceberg Z-ordering — re-expressed as plain
  * column math inside whole-stage codegen.)
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions (Morton magic-
    * number spreading — the textbook constant-time interleave). */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit bucket ranks. */
  def mortonZ(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scale a numeric column to a 16-bit bucket rank over [min, max]. */
  private def rank16(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(greatest(floor((c.cast("double") - lo) / span * 65535.0), lit(0.0)),
      lit(65535.0)).cast("long")
  }

  /** Write `df` Z-ordered on two numeric columns: one tiny stats pass for
    * the per-dimension ranges, then range-repartition + in-partition sort
    * on the Morton code and a plain parquet write. `files` bounds the
    * output file count (= range partitions). */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int = 8): Unit = {
    val r = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    val z = mortonZ(
      rank16(col(xCol), r.getDouble(0), r.getDouble(1)),
      rank16(col(yCol), r.getDouble(2), r.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write the event stream HIVE-PARTITIONED by UTC day — the canonical
    * 100 TB event-table layout (reference: the indexer's per-day rollup
    * epochs). Partition pruning is a stronger guarantee than row-group
    * stats pruning: a day-ranged query never OPENS a non-matching file,
    * so `PartitionFilters` (not just `PushedFilters`) carries the bound
    * and scan cost is O(days touched), independent of corpus size.
    * Within each day, rows sort by ts so intra-day ranges still prune at
    * the row-group level — the two mechanisms compose. NOTE: Spark does
    * NOT infer day bounds from a ts-range predicate; partition pruning
    * only fires when the query filters on the `day` column directly, so
    * callers must add an explicit day predicate (e.g.
    * `day BETWEEN to_date(lo) AND to_date(hi)`) alongside the ts range
    * to get both pruning layers. */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", to_date(col("ts")))
      .repartition(col("day"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").partitionBy("day").parquet(path)
}
