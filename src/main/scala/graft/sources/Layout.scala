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

  case class CompactStats(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, bytesAfter: Long)

  /** Small-file COMPACTION — the OPTIMIZE/bin-pack primitive every
    * long-lived table needs (streaming intake and per-block appends
    * write many small files; a 100 TB table fragmented into 4 MB files
    * pays per-file open/footer cost thousands of times per scan and
    * starves the scheduler with tiny splits). Rewrites `path` so output
    * files target `targetBytes`: file count = ceil(inputBytes / target)
    * (input size from the filesystem listing, so compression survives
    * the estimate), optionally range-sorted on `sortCol` to restore
    * locality for stats pruning while compacting. The rewrite is
    * data-first / swap-second: the compacted copy lands in a sibling
    * tmp dir and replaces the original via two renames, retaining the
    * original as `.old` until the swap completes — the data always
    * exists under `path` or `.old`, and the next call (or any crash)
    * SELF-HEALS: it restores a `.old` left by a crash between the two
    * renames before doing anything else, and only sweeps `.old` when
    * `path` itself is present. For a hive-partitioned layout, compact
    * each partition dir independently (partition dirs are the
    * compaction unit, like OPTIMIZE WHERE).
    *
    * CONCURRENCY CONTRACT: the caller must quiesce WRITERS on `path`
    * for the duration of the call (readers are fine — the table is
    * always complete under `path` or `.old`). GraftDB-owned dirs go
    * through `GraftDB.compactRollups`, which holds the collection
    * lock. As defense-in-depth against a writer that appends anyway,
    * the input listing is recorded in a `_compact_inputs` manifest that
    * travels with `.old`, and every `.old` sweep (normal or self-heal)
    * first RESCUES any parquet file not in that manifest — a
    * concurrently-appended file is moved back into `path`, never
    * deleted. */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long = 128L * 1024 * 1024,
      sortCol: Option[String] = None): CompactStats = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listStats(dir: Path): (Long, Long) = {
      val it = fs.listFiles(dir, true)
      var files = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          files += 1; bytes += f.getLen
        }
      }
      (files, bytes)
    }
    def listRel(dir: Path): Seq[String] = {
      val base = fs.makeQualified(dir).toString
      val it = fs.listFiles(dir, true)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          out += f.getPath.toString.stripPrefix(base).stripPrefix("/")
      }
      out.toSeq
    }
    val inputsName = "_compact_inputs"
    // Move any parquet under `retired` that is NOT in its recorded input
    // manifest back into `live` — it was appended by a concurrent writer
    // after our listing and must survive the sweep.
    def rescueStrays(retired: Path, live: Path): Unit = {
      val manifest = new Path(retired, inputsName)
      if (!fs.exists(manifest)) return
      val known: Set[String] = {
        val in = fs.open(manifest)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSet
        finally in.close()
      }
      listRel(retired).filterNot(known).foreach { rel =>
        val dst = new Path(live, rel)
        fs.mkdirs(dst.getParent)
        if (!fs.rename(new Path(retired, rel), dst))
          throw new java.io.IOException(s"compact: cannot rescue $rel")
      }
    }
    val tmp = new Path(p.getParent, p.getName + ".compact.tmp")
    val old = new Path(p.getParent, p.getName + ".old")
    val okName = "_compact_ok"
    // self-heal a crash between the two renames of a previous run: the
    // retired original is the only copy — restore it before anything
    if (!fs.exists(p) && fs.exists(old)) {
      if (!fs.rename(old, p))
        throw new java.io.IOException(s"compact: cannot restore $old")
    }
    fs.delete(tmp, true)
    // Sweeping a stale .old needs PROVENANCE, not just presence: `p`
    // existing does not mean the swap completed — a crash between the
    // two renames followed by a writer recreating `p` (the very
    // contract-violator rescueStrays defends against) would otherwise
    // skip the restore and this sweep would delete every
    // manifest-listed original. A published `p` carries the
    // `_compact_ok` marker (written into tmp before any rename, so it
    // travels with the rename); a writer-recreated `p` cannot.
    if (fs.exists(p) && fs.exists(old)) {
      if (fs.exists(new Path(p, okName))) {
        // completed swap that crashed before cleanup: rescue strays,
        // drop the retired originals
        rescueStrays(old, p)
        fs.delete(old, true)
      } else {
        // the swap never published: `p` holds only post-crash appends —
        // move EVERYTHING from .old back in (originals and strays both)
        listRel(old).foreach { rel =>
          val dst = new Path(p, rel)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(new Path(old, rel), dst))
            throw new java.io.IOException(s"compact: cannot merge-restore $rel")
        }
        fs.delete(old, true)
      }
    }
    // stale markers/manifests from a crash (Spark ignores _ files)
    fs.delete(new Path(p, inputsName), false)
    fs.delete(new Path(p, okName), false)
    val (fb, bb) = listStats(p)
    val nOut = math.max(1L, (bb + targetBytes - 1) / targetBytes).toInt
    // One listing is BOTH the recorded manifest and the exact file set
    // Spark reads — a file appended between any two listings can be
    // neither silently compacted-and-rescued (duplicate) nor
    // manifested-but-unread (loss).
    val inputs = listRel(p)
    if (inputs.isEmpty) return CompactStats(fb, bb, fb, bb)
    val qualBase = fs.makeQualified(p).toString
    val df = spark.read.option("basePath", path)
      .parquet(inputs.map(rel => s"$qualBase/$rel"): _*)
    val packed = sortCol match {
      case Some(c) => df.repartitionByRange(nOut, col(c))
        .sortWithinPartitions(col(c))
      case None => df.repartition(nOut)
    }
    packed.write.mode("overwrite").parquet(tmp.toString)
    // provenance marker: rides tmp→p through the publish rename, so a
    // later sweep can tell a PUBLISHED table from a writer-recreated one
    fs.create(new Path(tmp, okName), true).close()
    // record the compacted input set; the manifest rides along into
    // `.old` so any sweep (here or a later self-heal) can tell strays
    // (concurrent appends) from compacted originals
    locally {
      val outS = fs.create(new Path(p, inputsName), true)
      try outS.write(inputs.mkString("\n").getBytes("UTF-8"))
      finally outS.close()
    }
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: cannot retire $p")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back — original untouched
      fs.delete(new Path(p, inputsName), false)
      throw new java.io.IOException(s"compact: cannot publish $tmp")
    }
    rescueStrays(old, p)
    fs.delete(old, true)
    fs.delete(new Path(p, okName), false) // publish complete; marker done
    val (fa, ba) = listStats(p)
    CompactStats(fb, bb, fa, ba)
  }
}
