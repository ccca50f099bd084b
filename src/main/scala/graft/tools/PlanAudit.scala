package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints executed-plan summaries (exchange/broadcast/codegen counts) for
  * every SparkEntry query — the iteration loop for keeping plans honest.
  * Run: sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.001 [query]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_ == n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          def n(s: String) = plan.sliding(s.length).count(_ == s)
          println(f"$name%-22s exchanges=${n("Exchange")}%2d " +
            f"broadcasts=${n("BroadcastExchange")}%2d sorts=${n("Sort ")}%2d " +
            f"wscg=${n("*(")}%2d pushed=${if (plan.contains("PushedFilters: [")) "y" else "-"}")
          if (only.isDefined) println(fn(spark, dir).queryExecution.toString)
        } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
