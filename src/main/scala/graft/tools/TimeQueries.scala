package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev utility: time a SUBSET of `SparkEntry.queries` (args: sfDir
  * name...) over `SPARK_GRAFT_PASSES` passes (default 3) — the perf twin
  * of `RunOne`'s correctness loop, for iterating on one operator's plan
  * without paying a full `Bench` run. Prints per-pass seconds; the first
  * pass is cold (includes any per-corpus cache build), later passes warm.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: TimeQueries <sfDir> <query>...")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.eventsRaw(spark, sfDir).foreach(_ => ())
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s ${ts.map(t => f"$t%.3f").mkString("  ")}")
    }
    spark.stop()
  }
}
