package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.GraftDB
import graft.docstore.{FieldFilter, FieldValue, Op, StructuredQuery}

/** End-to-end demo of the GraftDB lifecycle (the reference's SDK flow:
  * createCollection → addDoc → queryDoc → update/delete → rollup →
  * recover). Run: sbt "runMain graft.tools.DbDemo /tmp/graftdb_demo" */
object DbDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graftdb_demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val db = new GraftDB(spark, root)
    db.createCollection("demo", "book")
    val ids = db.addDocuments("demo", "book", Seq(
      """{"name":"The Three-Body Problem","author":"Cixin-Liu","rate":5}""",
      """{"name":"Ball Lightning","author":"Cixin-Liu","rate":4}""",
      """{"name":"Snow Crash","author":"Neal-Stephenson","rate":4}"""))
    println(s"added ids: $ids")

    val byAuthor = db.query("demo", "book", StructuredQuery(
      where = Some(FieldFilter("author", Op.Eq, FieldValue.Str("Cixin-Liu"))),
      select = Seq("name", "rate")))
    println("query author==Cixin-Liu:")
    byAuthor.show(truncate = false)

    db.updateDocuments("demo", "book", Seq(ids.head), Seq("""{"rate":6}"""), Seq(Seq("rate")))
    db.deleteDocuments("demo", "book", Seq(ids(2)))
    val recs = db.rollup("demo", "book")
    recs.foreach(rec => println(s"rollup: blocks ${rec.startBlock}..${rec.endBlock}, " +
      s"${rec.mutationCount} mutations, ${rec.compressedBytes} bytes gzip -> ${rec.path}"))
    println("rollup manifest:")
    db.scanRollupRecords("demo", "book").show(truncate = false)

    println("state after masked update + delete + rollup + recover:")
    db.recover("demo", "book").df.orderBy("_id").show(truncate = false)
    spark.stop()
  }
}
