package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ArgMaxTies: one-aggregation arg-max keeping the FULL tied key set,
  * partition-count invariant (the merge is associative/commutative up
  * to key-set union, and eval sorts keys). */
class ArgMaxTiesSpec extends SparkSpec {
  import spark.implicits._

  test("keeps every tied key, exact decimal comparison, sorted output") {
    val df = Seq(
      (1L, "10.10"), (2L, "10.10"), (3L, "9.99"), (4L, "10.10"), (5L, "0.01"))
      .toDF("k", "v")
      .select($"k", $"v".cast("decimal(18,2)").as("v"))
    val r = df.agg(GraftFunctions.argmax_ties($"v", $"k").as("w"))
      .select($"w.value".cast("string"), $"w.keys").head()
    assert(r.getString(0) === "10.10")
    assert(r.getSeq[Long](1) === Seq(1L, 2L, 4L))
  }

  test("invariant under repartitioning; null on empty; nulls skipped") {
    val base = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") % 7).cast("double").as("v"))
    val expected = base.repartition(1)
      .agg(GraftFunctions.argmax_ties($"v", $"k").as("w"))
      .select($"w.value", $"w.keys").head()
    for (p <- Seq(3, 13, 64)) {
      val got = base.repartition(p)
        .agg(GraftFunctions.argmax_ties($"v", $"k").as("w"))
        .select($"w.value", $"w.keys").head()
      assert(got === expected, s"p=$p")
    }
    val empty = spark.range(0).select(col("id").as("k"),
      col("id").cast("double").as("v"))
      .agg(GraftFunctions.argmax_ties($"v", $"k").as("w")).head()
    assert(empty.isNullAt(0))
    val withNulls = Seq((1L, Some(5.0)), (2L, None), (3L, Some(5.0)))
      .toDF("k", "v")
      .agg(GraftFunctions.argmax_ties($"v", $"k").as("w"))
      .select($"w.keys").head()
    assert(withNulls.getSeq[Long](0) === Seq(1L, 3L))
  }

  test("buffer-backed string values are copied, not aliased") {
    // parquet scans hand eval() UTF8Strings that point into the reused
    // read buffer; a captured running max must own its bytes or later
    // rows corrupt it (the InternalRow.copyValue contract)
    val dir = java.nio.file.Files.createTempDirectory("graft-argmax").toString
    spark.range(0, 10000)
      .selectExpr("id",
        "concat('v', lpad(cast(id % 977 as string), 6, '0')) as s")
      .write.mode("overwrite").parquet(dir)
    val r = spark.read.parquet(dir)
      .agg(GraftFunctions.argmax_ties(col("s"), col("id")).as("w"))
      .select($"w.value".cast("string"), $"w.keys").head()
    assert(r.getString(0) === "v000976")
    assert(r.getSeq[Long](1) ===
      (0 until 10000).filter(_ % 977 == 976).map(_.toLong))
  }

  test("fuzz: 30 random streams equal the driver-side model across types") {
    // seeded random (value, key) streams with heavy tie rates, nulls,
    // and random partition counts, checked against a plain driver-side
    // fold — per value type (long, double, decimal, string)
    val r = new scala.util.Random(41011)
    for (round <- 1 to 30) {
      val n = 1 + r.nextInt(2000)
      val distinctVals = 1 + r.nextInt(1 + r.nextInt(20)) // often tie-heavy
      val tpe = round % 4
      val rows: Seq[(Option[Any], Long)] = (0 until n).map { i =>
        val v: Option[Any] =
          if (r.nextInt(10) == 0) None
          else {
            val base = r.nextInt(distinctVals)
            Some(tpe match {
              case 0 => base.toLong * 3 - 7
              case 1 => base.toDouble / 8.0
              case 2 => new java.math.BigDecimal(s"$base.25")
              case _ => f"s$base%04d"
            })
          }
        (v, i.toLong)
      }
      val model: Option[(Any, Seq[Long])] = {
        val present = rows.collect { case (Some(v), k) => (v, k) }
        if (present.isEmpty) None
        else {
          implicit val ord: Ordering[Any] = (a: Any, b: Any) => (a, b) match {
            case (x: Long, y: Long) => java.lang.Long.compare(x, y)
            case (x: Double, y: Double) => java.lang.Double.compare(x, y)
            case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
            case (x: String, y: String) => x.compareTo(y)
            case _ => fail(s"type mix: $a vs $b")
          }
          val best = present.map(_._1).max
          Some((best, present.collect { case (v, k) if ord.equiv(v, best) => k }.sorted))
        }
      }
      val df = (tpe match {
        case 0 => rows.map { case (v, k) => (v.map(_.asInstanceOf[Long]), k) }.toDF("v", "k")
        case 1 => rows.map { case (v, k) => (v.map(_.asInstanceOf[Double]), k) }.toDF("v", "k")
        case 2 => rows.map { case (v, k) =>
          (v.map(x => BigDecimal(x.asInstanceOf[java.math.BigDecimal])), k) }.toDF("v", "k")
        case _ => rows.map { case (v, k) => (v.map(_.asInstanceOf[String]), k) }.toDF("v", "k")
      }).repartition(1 + r.nextInt(8))
      val got = df.agg(GraftFunctions.argmax_ties(col("v"), col("k")).as("w"))
        .select($"w.value".cast("string"), $"w.keys").head()
      model match {
        case None => assert(got.isNullAt(0), s"round=$round: expected null")
        case Some((bv, bks)) =>
          assert(got.getSeq[Long](1) === bks, s"round=$round keys")
          val gotV = got.getString(0)
          bv match {
            case s: String => assert(gotV === s, s"round=$round value")
            case num => // numeric: compare scale-insensitively
              assert(new java.math.BigDecimal(gotV)
                .compareTo(new java.math.BigDecimal(num.toString)) === 0,
                s"round=$round value $gotV vs $num")
          }
      }
    }
  }

  test("q15 equals the two-step groupBy(value)+collect_list+max_by form") {
    val dir = sf
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val rev = graft.sources.Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum($"l_extendedprice".cast(D) * (lit(1).cast(D) - $"l_discount".cast(D)))
        .as("total_rev"))
    val twoStep = rev.groupBy($"total_rev")
      .agg(collect_list($"l_suppkey").as("ks"))
      .agg(max_by(struct($"total_rev", $"ks"), $"total_rev").as("w"))
      .select(explode($"w.ks").as("k"), $"w.total_rev".as("v"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).sortBy(_._1)
    val oneStep = rev.agg(GraftFunctions.argmax_ties($"total_rev", $"l_suppkey").as("w"))
      .select(explode($"w.keys").as("k"), $"w.value".as("v"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1))).sortBy(_._1)
    assert(oneStep.nonEmpty && oneStep.sameElements(twoStep))
  }
}
