package graft.tools

import org.apache.spark.sql.SparkSession

// Scratch: print a query's executed plan (test scope only).
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
