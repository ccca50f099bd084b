package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Scratch: print the dispatcher's decision inputs on a corpus.
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_skew_10x")
    val ev = graft.sources.Tables.events(spark, dir)
    val (share, hot, total) = graft.operators.SkewDispatch.hottestKey(ev, col("user_id"))
    println(s"DISPATCH share=$share hot=$hot total=$total " +
      s"asof=${graft.operators.SkewDispatch.isSkewed(ev, share, hot)} " +
      s"sess=${graft.operators.SkewDispatch.isSkewed(ev, share, hot,
        minHotRows = graft.operators.SkewDispatch.SessionizeMinHotRows)}")
    spark.stop()
  }
}
