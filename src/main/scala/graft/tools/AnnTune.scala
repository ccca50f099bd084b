package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Ann, Dedup}

/** One-off measurement harness: recall of the approximate ANN paths vs
  * brute force, and capture of the embedding near-dup blocker, at a given
  * sf dir. Not part of the driver contract. */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val brute = Ann.annCosineTopk(spark, sfDir)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    for ((bits, tables) <- Seq((4, 8), (4, 12), (4, 16), (3, 8), (5, 12), (6, 16))) {
      val lsh = Ann.annLshTables(spark, sfDir, bits, tables)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"LSH bits=$bits tables=$tables recall=${(brute & lsh).size.toDouble / brute.size}%.3f")
    }

    val ivf = Ann.annIvf(spark, sfDir)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"IVF recall=${(brute & ivf).size.toDouble / brute.size}%.3f")

    // embedding near-dup: does the IVF blocker cover the label-blocked pairs?
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_v"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("embedding").as("b_v"))
    val labelPairs = a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", graft.functions.GraftFunctions.cosine_sim(col("a_v"), col("b_v")))
      .filter(col("cos") >= 0.4).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.dedupEmbedding(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"embedding: labelPairs=${labelPairs.size} blocked=${blocked.size} " +
      s"missing=${(labelPairs -- blocked).size}")
    spark.stop()
  }
}
