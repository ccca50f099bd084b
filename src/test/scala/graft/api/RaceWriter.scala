package graft.api

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Subprocess entry point for GraftDBConcurrencySpec's cross-PROCESS
  * race: a separate JVM with its own SparkSession appending batches to
  * the same collection root as the parent. Touches `ready_<tag>` once
  * initialized, then spins until the parent creates `go` (so all racers
  * enter the write loop together despite multi-second JVM/Spark
  * startup skew). The FileChannel half of the collection lock is what
  * this exercises — JVM monitors do not reach across processes.
  */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val tag = args(1)
    val batches = args(2).toInt
    // "crash" = die HARD (Runtime.halt — no shutdown hooks, the OS
    // releases the FileChannel lock) between the data append and the
    // state commit of the FIRST batch: the cross-process version of the
    // crashed-writer window, leaving an uncommitted blk_ dir on disk
    // and the collection lock free
    val crash = args.length > 3 && args(3) == "crash"
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val db = new GraftDB(spark, s"$root/db")
    db.createCollection("d", "c")
    if (crash) {
      db.failpoint = l =>
        if (l == "addDocuments:afterAppend") Runtime.getRuntime.halt(42)
      db.addDocuments("d", "c", Seq(s"""{"w":"$tag","crashed":true}"""))
      sys.error("halt failpoint never fired") // unreachable when armed
    }
    Files.write(Paths.get(root, s"ready_$tag"), Array.emptyByteArray)
    val go = Paths.get(root, "go")
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!Files.exists(go)) {
      if (System.nanoTime() > deadline) sys.error("go-file never appeared")
      Thread.sleep(20)
    }
    for (b <- 0 until batches)
      db.addDocuments("d", "c", Seq(s"""{"w":"$tag","b":$b}"""))
    spark.stop()
  }
}
