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
    // all carries in ONE select → one Window operator (foldLeft over
    // withColumn stacks one Window node per column)
    val carried = u.select(u.columns.map(col) ++ rightCols.map(c =>
      last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w)
        .as(s"__m_$c")): _*)
    val matched = carried.filter(col("__side") === 1)
      .filter(col(s"__m_${rightCols.head}").isNotNull)
    val out = left.columns.map(col) ++
      rightCols.map(c => col(s"__m_$c").as(c))
    matched.select(out.toIndexedSeq: _*)
  }

  /** Dispatching as-of: probes the LEFT key's histogram (one
    * `SkewDispatch` Misra-Gries pass over the column-pruned key scan —
    * the left/event side is where the hot-key hazard lives; the right
    * side is typically the smaller dimension timeline) and runs
    * `asOfBucketed` iff the hottest key would overfill one window
    * task, else the ~3×-cheaper-at-uniform direct `asOf`. Identical
    * output contract either way. */
  def asOfAuto(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      bucketUs: Long = 6L * 3600 * 1000 * 1000,
      skewFactor: Double = 4.0,
      minHotRows: Long = SkewDispatch.DefaultMinHotRows): DataFrame =
    if (SkewDispatch.decide(left, col(leftKey), skewFactor, minHotRows))
      asOfBucketed(left, right, leftKey, rightKey, leftTime, rightTime,
        rightCols, bucketUs)
    else asOf(left, right, leftKey, rightKey, leftTime, rightTime, rightCols)

  /** Skew-resilient as-of: same result as `asOf` (same per-column
    * ignoreNulls carry semantics), different shape for hot keys. The
    * direct form sorts a key's ENTIRE timeline in one window task; here
    * the carry runs inside (key, time-bucket) windows — the hot key's
    * sort splits across buckets — and state crosses buckets through ONE
    * summary row per (key, bucket, column): the bucket's last non-null
    * right value. A bucket-ordered window over those summaries (rows ≪
    * events) gives the state entering each bucket; a left row matches
    * its in-bucket carry, falling back to the entering state. The same
    * two-phase trick as `evt_sessionize_buckets`.
    *
    * Times must be timestamps or integral epochs (needed for the bucket
    * division); `bucketUs` is in the time column's own units for
    * integral times. A NULL right time means "since forever" in the
    * direct form (nulls sort first), so here null times coalesce to
    * Long.MinValue — same ordering, and the value still crosses bucket
    * boundaries. */
  def asOfBucketed(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      bucketUs: Long = 6L * 3600 * 1000 * 1000): DataFrame = {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType,
      LongType, IntegerType, ShortType}
    def toLong(df: DataFrame, c: String): Column = {
      val t = df.schema(c).dataType match {
        case TimestampType | TimestampNTZType =>
          unix_micros(col(c).cast("timestamp"))
        case LongType | IntegerType | ShortType => col(c).cast("long")
        case dt => throw new IllegalArgumentException(
          s"asOfBucketed needs timestamp or integral time, got $dt for $c")
      }
      // null time = -inf, matching the direct form's nulls-first sort
      coalesce(t, lit(Long.MinValue))
    }
    val lTagged = left
      .withColumn("__k", col(leftKey)).withColumn("__tb", toLong(left, leftTime))
      .withColumn("__side", lit(1))
    val rTagged = right
      .withColumn("__k", col(rightKey)).withColumn("__tb", toLong(right, rightTime))
      .withColumn("__side", lit(0))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__bucket", expr(s"__tb div $bucketUs"))
    // phase 1: in-bucket carry (right rows sort before left at equal t)
    val wLocal = Window.partitionBy(col("__k"), col("__bucket"))
      .orderBy(col("__tb").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.select(u.columns.map(col) ++ rightCols.map(c =>
      last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(wLocal)
        .as(s"__lm_$c")): _*)
    // phase 2: state entering each bucket — per column, the last
    // non-null right value of any EARLIER bucket. Built WITHOUT touching
    // the phase-1 branch (under AQE the two uses of the union would each
    // re-run the heavy windowed scan): per-bucket summaries aggregate
    // the RIGHT side alone (one max(struct(t, v)) per column, map-side
    // collapsible), then a full-outer join with the LEFT side's observed
    // (key, bucket) pairs densifies the grid so left-only buckets get an
    // entering-state row too. Both inputs collapse to bucket cardinality
    // before their (tiny) shuffles, and the cross-bucket window runs
    // over summary rows, never events.
    val aggExprs = rightCols.map { c =>
      max(when(col(c).isNotNull, struct(col("__tb").as("t"), col(c).as("v"))))
        .as(s"__sv_$c")
    }
    val rightSum = rTagged
      .withColumn("__bucket", expr(s"__tb div $bucketUs"))
      .groupBy(col("__k"), col("__bucket"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    val leftBuckets = lTagged
      .withColumn("__bucket", expr(s"__tb div $bucketUs"))
      .select(col("__k"), col("__bucket")).distinct()
    val summed = leftBuckets.join(rightSum, Seq("__k", "__bucket"), "full_outer")
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = summed.select(Seq(col("__k"), col("__bucket")) ++
      rightCols.map(c =>
        last(col(s"__sv_$c").getField("v"), ignoreNulls = true).over(wB)
          .as(s"__in_$c")): _*)
    // combine: in-bucket match, else the entering state
    val matched = local.filter(col("__side") === 1)
      .join(carryIn, Seq("__k", "__bucket"), "left")
    val withM = rightCols.foldLeft(matched) { (df, c) =>
      df.withColumn(s"__m_$c", coalesce(col(s"__lm_$c"), col(s"__in_$c")))
    }
    val out = left.columns.map(col) ++
      rightCols.map(c => col(s"__m_$c").as(c))
    withM.filter(col(s"__m_${rightCols.head}").isNotNull)
      .select(out.toIndexedSeq: _*)
  }
}
