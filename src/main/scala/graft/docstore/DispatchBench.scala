package graft.docstore

import org.apache.spark.sql.SparkSession

/** One-JVM A/B for the fused-dispatch boundary: times the SAME
  * StructuredQuery through the per-field compiler ([[DocStore.query]])
  * and the fused single-parse compiler ([[DocStore.queryFusedAlways]])
  * in alternating passes, so box drift hits both arms equally (the r14
  * rule was calibrated from cross-run medians, which is how the
  * single-Eq/In regression slipped in).
  *
  * Run: sbt "runMain graft.docstore.DispatchBench <sfDir> [passes]"
  */
object DispatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = DocStore.eventsCollection(spark, sfDir)
    c.df.count() // warm the collection fixture

    import FieldValue._
    // the declared-query shapes on the knife edge (DocQueries.scala)
    val shapes: Seq[(String, StructuredQuery)] = Seq(
      "eq(sel=same)" -> StructuredQuery(
        where = Some(FieldFilter("event_type", Op.Eq, Str("purchase"))),
        select = Seq("event_type")),
      "in(sel=same)" -> StructuredQuery(
        where = Some(FieldFilter("event_type", Op.In,
          Arr(Seq(Str("signup"), Str("error"))))),
        select = Seq("event_type")),
      "neq(sel=same)" -> StructuredQuery(
        where = Some(FieldFilter("event_type", Op.Neq, Str("error"))),
        select = Seq("event_type")),
      "limit(sel=same)" -> StructuredQuery(
        where = Some(FieldFilter("value", Op.Gt, Dbl(150.0))),
        select = Seq("value"), limit = Some(20)),
      "orderby(sort+sel)" -> StructuredQuery(
        where = Some(FieldFilter("value", Op.Gt, Dbl(150.0))),
        select = Seq("k"),
        orderBy = Seq(Order("k", desc = true, keyType = I64(0))),
        limit = Some(50)),
      "offset(sort+sel)" -> StructuredQuery(
        where = Some(FieldFilter("event_type", Op.Eq, Str("view"))),
        select = Seq("value"),
        orderBy = Seq(Order("value", keyType = Dbl(0))),
        offset = Some(100), limit = Some(40)),
      "cursor(sort+cur)" -> StructuredQuery(
        orderBy = Seq(Order("k", keyType = I64(0))),
        startAt = Some(Cursor(Seq(Some(I64(40))), id = Some(1000L), inclusive = false)),
        endAt = Some(Cursor(Seq(Some(I64(80))))),
        limit = Some(60)))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both compilers once per shape
    shapes.foreach { case (_, q) =>
      DocStore.query(c, q).count(); DocStore.queryFusedAlways(c, q).count()
    }
    val per = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val fus = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (p <- 1 to passes; (name, q) <- shapes) {
      // alternate arm order per pass so neither arm always runs cold/hot
      if (p % 2 == 1) {
        per(name) = per(name) :+ time(DocStore.query(c, q).count())
        fus(name) = fus(name) :+ time(DocStore.queryFusedAlways(c, q).count())
      } else {
        fus(name) = fus(name) :+ time(DocStore.queryFusedAlways(c, q).count())
        per(name) = per(name) :+ time(DocStore.query(c, q).count())
      }
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    println(f"${"shape"}%-20s ${"per-field"}%10s ${"fused"}%10s   winner")
    shapes.foreach { case (name, _) =>
      val pm = med(per(name)); val fm = med(fus(name))
      val w = if (pm <= fm) "per-field" else "fused"
      println(f"$name%-20s $pm%10.3f $fm%10.3f   $w (${fm / pm}%.2fx)")
    }
    spark.stop()
  }
}
