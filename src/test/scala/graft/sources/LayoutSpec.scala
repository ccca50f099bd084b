package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  test("mortonZ interleaves bits (hand-checked codes, order-preserving on the diagonal)") {
    val df = spark.range(1).select(
      Layout.mortonZ(lit(0L), lit(0L)).as("z00"),
      Layout.mortonZ(lit(1L), lit(0L)).as("z10"),
      Layout.mortonZ(lit(0L), lit(1L)).as("z01"),
      Layout.mortonZ(lit(3L), lit(5L)).as("z35"),
      Layout.mortonZ(lit(0xFFFFL), lit(0xFFFFL)).as("zmax"))
    val r = df.head()
    assert(r.getAs[Long]("z00") === 0L)
    assert(r.getAs[Long]("z10") === 1L)
    assert(r.getAs[Long]("z01") === 2L)
    // x=3 (011), y=5 (101) -> interleave y2x2 y1x1 y0x0 = 10 01 11 = 0x27
    assert(r.getAs[Long]("z35") === 0x27L)
    assert(r.getAs[Long]("zmax") === 0xFFFFFFFFL)
  }

  test("z-ordered files cover small rectangles of both dimensions") {
    val dir = Files.createTempDirectory("zorder").toString
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("value"), col("event_id"))
    Layout.zorderWrite(ev, s"$dir/z", "user_id", "value", files = 8)

    def spans(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("user_id") - min("user_id")).cast("double").as("uspan"),
          (max("value") - min("value")).as("vspan"))
        .agg(avg("uspan"), avg("vspan")).head()
      (byFile.getDouble(0), byFile.getDouble(1))
    }
    val g = ev.agg((max("user_id") - min("user_id")).cast("double"),
      (max("value") - min("value"))).head()
    val (gu, gv) = (g.getDouble(0), g.getDouble(1))
    val (zu, zv) = spans(s"$dir/z")
    // every file must cover a strict sub-rectangle in BOTH dims — a
    // single-column sort would leave one dimension at ~full span
    assert(zu < gu * 0.6, s"user_id span $zu not clustered vs global $gu")
    assert(zv < gv * 0.6, s"value span $zv not clustered vs global $gv")
    // and no rows were lost or duplicated by the reshuffle
    assert(spark.read.parquet(s"$dir/z").count() === ev.count())
  }

  test("day-partitioned events: day filters prune PARTITIONS, not just row groups") {
    val dir = Files.createTempDirectory("byday").toString
    val ev = Tables.events(spark, sf)
    Layout.writeEventsByDay(ev, s"$dir/events")
    val back = spark.read.parquet(s"$dir/events")
    // one day's query: the filter is on the PARTITION column
    val oneDay = back.filter(col("day") === lit("2024-01-05").cast("date"))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"),
      s"day bound must land in PartitionFilters:\n$plan")
    // pruning is physical: only the matching partition's files are read
    val filesRead = oneDay.select(input_file_name()).distinct().collect()
    assert(filesRead.nonEmpty && filesRead.forall(_.getString(0).contains("day=2024-01-05")))
    // row-set equivalence with the unpartitioned source
    val want = ev.filter(to_date(col("ts")) === lit("2024-01-05").cast("date")).count()
    assert(oneDay.count() === want && want > 0)
    // intra-day order: rows inside each file are ts-sorted, so ts range
    // predicates compose row-group pruning on top of partition pruning
    val seq = oneDay.select(input_file_name().as("f"), col("ts"))
      .groupBy("f").agg(count(lit(1)).as("n")).head()
    assert(seq.getLong(1) > 0)
  }

  test("compactSmallFiles bin-packs fragments, preserves data, survives re-sort") {
    val root = Files.createTempDirectory("graft-compact").toString
    val path = s"$root/frag"
    // fragment: 64 tiny files of a 2k-row table
    val df = spark.range(2000).select(col("id"),
      (col("id") % 7).as("k"), md5(col("id").cast("string")).as("payload"))
    df.repartition(64).write.parquet(path)
    val before = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before === 64)
    val want = spark.read.parquet(path).collect().toSet

    val stats = Layout.compactSmallFiles(spark, path,
      targetBytes = 256L * 1024, sortCol = Some("id"))
    assert(stats.filesBefore === 64L)
    assert(stats.filesAfter < stats.filesBefore)
    // expected pack count from the listed input bytes
    val expect = math.max(1L, (stats.bytesBefore + 256L * 1024 - 1) / (256L * 1024))
    assert(stats.filesAfter === expect)
    // data identical, no tmp/old residue
    assert(spark.read.parquet(path).collect().toSet === want)
    assert(!new java.io.File(s"$root/frag.old").exists())
    assert(!new java.io.File(s"$root/frag.compact.tmp").exists())
    // the sort column restored locality: per-file id ranges are disjoint
    val byFile = spark.read.parquet(path)
      .select(col("id"), org.apache.spark.sql.functions
        .input_file_name().as("f"))
      .groupBy(col("f")).agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    byFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"file id ranges overlap: $hi1 vs $lo2")
      case _ =>
    }

    // crash window between the two renames: path gone, .old holds the
    // only copy — the next call must restore it before compacting
    new java.io.File(path).renameTo(new java.io.File(s"$root/frag.old"))
    assert(!new java.io.File(path).exists())
    val stats2 = Layout.compactSmallFiles(spark, path,
      targetBytes = 256L * 1024, sortCol = Some("id"))
    assert(spark.read.parquet(path).collect().toSet === want)
    assert(!new java.io.File(s"$root/frag.old").exists())
    assert(stats2.filesAfter === expect)
  }

  test("compactSmallFiles rescues a concurrently-appended file instead of deleting it") {
    // The contract requires quiesced writers, but a violator must lose
    // no committed rows: a file appended AFTER the input listing is
    // absent from the _compact_inputs manifest, so the .old sweep moves
    // it back into the table instead of deleting it.
    val root = Files.createTempDirectory("graft-compact-stray").toString
    val path = s"$root/t"
    // construct the crashed-after-swap state by hand: `t` holds the
    // compacted copy, `t.old` holds the retired inputs PLUS a stray
    // parquet a concurrent writer appended after the input listing
    // (so it is absent from _compact_inputs)
    spark.range(100).select(col("id")).coalesce(1).write.parquet(path)
    val want = spark.read.parquet(path).collect().toSet
    spark.range(100).select(col("id")).coalesce(1)
      .write.parquet(s"$root/t.old") // superseded originals
    spark.range(100, 110).select(col("id"))
      .coalesce(1).write.parquet(s"$root/stray_src")
    val oldDir = new java.io.File(s"$root/t.old")
    val listed = oldDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.getName)
    val strayFile = new java.io.File(s"$root/stray_src").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val strayName = "stray-" + strayFile.getName
    java.nio.file.Files.copy(strayFile.toPath,
      java.nio.file.Paths.get(s"$root/t.old", strayName))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/t.old", "_compact_inputs"),
      listed.mkString("\n").getBytes("UTF-8"))
    // the crashed run HAD published `t` — mark its provenance (a `t`
    // without the marker is treated as writer-recreated and merged)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_compact_ok"), Array.emptyByteArray)

    // the sweep must rescue the stray into `t` (not delete it), drop
    // the manifest-listed originals, and compact the union
    val stats = Layout.compactSmallFiles(spark, path, targetBytes = 1L << 20)
    val after = spark.read.parquet(path).collect().toSet
    assert(after === want ++ (100L until 110L).map(org.apache.spark.sql.Row(_)))
    // exactly 110 rows: the manifest-listed originals were NOT rescued
    // back (that would duplicate every row of `want`)
    assert(spark.read.parquet(path).count() === 110L)
    assert(stats.filesAfter >= 1)
    assert(!new java.io.File(s"$root/t.old").exists())
    assert(!new java.io.File(s"$path/_compact_inputs").exists())
    assert(!new java.io.File(s"$path/_compact_ok").exists())
  }

  test("unpublished swap + writer-recreated table: originals merge back, nothing lost") {
    // Crash between the two renames leaves `.old` as the only copy; a
    // contract-violating writer then recreates `t` with new rows. The
    // recreated `t` has no _compact_ok provenance marker, so the sweep
    // must MERGE .old back in (originals AND strays) instead of treating
    // `t` as a completed swap and deleting the manifest-listed originals.
    val root = Files.createTempDirectory("graft-compact-merge").toString
    val path = s"$root/t"
    spark.range(100).select(col("id")).coalesce(1).write.parquet(s"$root/t.old")
    val oldFiles = new java.io.File(s"$root/t.old").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/t.old", "_compact_inputs"),
      oldFiles.mkString("\n").getBytes("UTF-8"))
    // the writer's post-crash recreation of `t` (no marker)
    spark.range(100, 110).select(col("id")).coalesce(1).write.parquet(path)

    Layout.compactSmallFiles(spark, path, targetBytes = 1L << 20)
    val after = spark.read.parquet(path).collect().toSet
    assert(after === (0L until 110L).map(org.apache.spark.sql.Row(_)).toSet)
    assert(spark.read.parquet(path).count() === 110L)
    assert(!new java.io.File(s"$root/t.old").exists())
  }
}
