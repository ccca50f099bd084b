package graft.tools

/** Plan dumper for the optimization-round deliverables.
  *
  * One query to stdout (physical plan string, the original mode):
  *   runMain graft.tools.PlanDump <query> <sfDir>
  * Many queries to files (`.explain("formatted")` — the judge-readable
  * artifact under plans/rNN/):
  *   runMain graft.tools.PlanDump <sfDir> --out <dir> <suffix> <q1,q2,...>
  * writes <dir>/<query>_<suffix>.txt per query in ONE JVM.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def formatted(name: String): String =
      graft.SparkEntry.queries(name)(spark, if (args(1) == "--out") args(0) else args(1))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    if (args.length >= 2 && args(1) == "--out") {
      val dir = java.nio.file.Paths.get(args(2))
      java.nio.file.Files.createDirectories(dir)
      val suffix = args(3)
      args(4).split(",").foreach { q =>
        java.nio.file.Files.write(dir.resolve(s"${q}_$suffix.txt"),
          formatted(q).getBytes("UTF-8"))
        println(s"[plandump] wrote ${q}_$suffix.txt")
      }
    } else {
      val df = graft.SparkEntry.queries(args(0))(spark, args(1))
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
