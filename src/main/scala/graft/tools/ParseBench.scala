package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.docstore._

/** Micro-benchmark for the fused single-parse doc compiler on WIDE docs —
  * the testdata's ~100-byte docs hide the parse cost that dominates real
  * multi-KB document scans. Builds n docs with `width` string fields
  * (~40 bytes each), runs a 4-field filter + 3-field projection through
  * the per-field compiler (`DocStore.query`: one get_json_object scan per
  * referenced field) and the fused compiler (`queryFused`: one from_json
  * behind the parse fence), and prints median seconds over `passes`.
  *
  * Usage: runMain graft.tools.ParseBench [nDocs] [width] [passes]
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val width = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fields = (0 until width).map(i =>
      concat(lit(s"v${i}_"), (col("id") * (i + 1) % 99991).cast("string"))
        .as(s"f$i"))
    val docs = spark.range(n.toLong)
      .select(col("id").as("_id"), to_json(struct(fields: _*)).as("doc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    docs.count() // materialize: measure query cost, not doc synthesis
    val coll = DocCollection("wide", docs)

    import FieldValue._
    val q = StructuredQuery(
      where = Some(AndFilter(Seq(
        FieldFilter("f0", Op.Neq, Str("x")),
        FieldFilter("f1", Op.Neq, Str("y")),
        FieldFilter("f2", Op.Neq, Str("z")),
        FieldFilter("f3", Op.Neq, Str("w"))))),
      select = Seq("f4", "f5", "f6"))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val c = f
      require(c > 0); (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    val perField = median((1 to passes).map(_ => time(DocStore.query(coll, q).count())))
    val fused = median((1 to passes).map(_ => time(DocStore.queryFused(coll, q).count())))
    println(f"docs=$n width=$width passes=$passes")
    println(f"per_field_sec=$perField%.3f fused_sec=$fused%.3f speedup=${perField / fused}%.2fx")
    spark.stop()
  }
}
