package graft.docstore

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DocStoreSpec extends SparkSpec {
  import FieldValue._

  private lazy val coll = DocStore.eventsCollection(spark, sf)
  private lazy val events = graft.sources.Tables.events(spark, sf)

  test("FieldFilter Eq matches relational ground truth") {
    val got = DocStore.query(coll,
      StructuredQuery(where = Some(FieldFilter("event_type", Op.Eq, Str("purchase"))))).count()
    val want = events.filter(col("event_type") === "purchase").count()
    assert(got === want && got > 0)
  }

  test("range + AND composite filter") {
    val got = DocStore.query(coll, StructuredQuery(where = Some(AndFilter(Seq(
      FieldFilter("k", Op.Gt, I64(50)),
      FieldFilter("value", Op.Le, Dbl(100.0))))))).count()
    val want = events
      .filter(get_json_object(col("props"), "$.k").cast("long") > 50 && col("value") <= 100.0)
      .count()
    assert(got === want && got > 0)
  }

  test("Neq excludes exactly the equal rows") {
    val eq = DocStore.query(coll,
      StructuredQuery(where = Some(FieldFilter("event_type", Op.Eq, Str("error"))))).count()
    val neq = DocStore.query(coll,
      StructuredQuery(where = Some(FieldFilter("event_type", Op.Neq, Str("error"))))).count()
    assert(eq + neq === coll.df.count())
  }

  test("array-contains over a JSON array field") {
    import spark.implicits._
    val docs = Seq(
      (1L, """{"tags":["a","b"]}"""),
      (2L, """{"tags":["c"]}"""),
      (3L, """{"tags":[]}""")).toDF("_id", "doc")
    val got = DocStore.query(DocCollection("t", docs),
      StructuredQuery(where = Some(FieldFilter("tags", Op.ArrayContains, Str("a")))))
      .select("_id").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("UnaryFilter pins the three null-ish states: missing vs null vs NaN") {
    import spark.implicits._
    // doc 1: k explicit null; doc 2: k missing; doc 3: k numeric;
    // doc 4: k is the NaN-serialized double; doc 5: k non-numeric string;
    // doc 6: k null at a NESTED path whose parent exists / is scalar
    val docs = Seq(
      (1L, """{"k":null,"t":1}"""),
      (2L, """{"t":2}"""),
      (3L, """{"k":7,"t":3}"""),
      (4L, """{"k":"NaN","t":4}"""),
      (5L, """{"k":"abc","t":5}"""),
      (6L, """{"m":{"k":null},"t":6}"""),
      (7L, """{"m":"scalar","t":7}""")).toDF("_id", "doc")
    val c = DocCollection("u", docs)
    def ids(f: Filter): Seq[Long] =
      DocStore.query(c, StructuredQuery(where = Some(f)))
        .select("_id").as[Long].collect().toSeq.sorted
    import UnaryOp._
    // Firestore rule: a MISSING field matches no filter — doc 2 never appears
    assert(ids(UnaryFilter("k", IsNull)) === Seq(1L))
    assert(ids(UnaryFilter("k", IsNotNull)) === Seq(3L, 4L, 5L))
    assert(ids(UnaryFilter("k", IsNan)) === Seq(4L))
    // not-NaN admits non-numeric values (they are not NaN) but never null
    assert(ids(UnaryFilter("k", IsNotNan)) === Seq(3L, 5L))
    // nested path: parent presence probed; scalar parent matches nothing
    assert(ids(UnaryFilter("m.k", IsNull)) === Seq(6L))
    assert(ids(UnaryFilter("m.k", IsNotNull)) === Seq())
    // both compilers agree (the fused path probes raw for unary ops)
    val q = StructuredQuery(where = Some(AndFilter(Seq(
      UnaryFilter("k", IsNotNan), FieldFilter("t", Op.Ge, I64(0)),
      FieldFilter("t", Op.Le, I64(9)), FieldFilter("t", Op.Neq, I64(99))))))
    assert(DocStore.queryFused(c, q).select("_id").as[Long].collect().toSeq.sorted
      === Seq(3L, 5L))
  }

  test("projection returns _id plus selected fields only") {
    val df = DocStore.query(coll,
      StructuredQuery(select = Seq("user_id", "event_type"), limit = Some(5)))
    assert(df.columns.toSeq === Seq("_id", "user_id", "event_type"))
    assert(df.count() === 5)
  }

  test("fused single-parse query equals the per-field query on all shapes") {
    val qs = Seq(
      StructuredQuery(where = Some(FieldFilter("event_type", Op.Eq, Str("purchase"))),
        select = Seq("event_type")),
      StructuredQuery(where = Some(AndFilter(Seq(
        FieldFilter("k", Op.Gt, I64(50)), FieldFilter("value", Op.Le, Dbl(100.0)),
        FieldFilter("event_type", Op.Neq, Str("error"))))),
        select = Seq("user_id", "value")),
      StructuredQuery(where = Some(FieldFilter("value", Op.Gt, Dbl(150.0))),
        select = Seq("value"), limit = Some(20)))
    qs.foreach { q =>
      val a = DocStore.query(coll, q)
      val b = DocStore.queryFused(coll, q)
      assert(a.columns.toSeq === b.columns.toSeq, s"cols for $q")
      assert(a.exceptAll(b).count() === 0, s"a-b for $q")
      assert(b.exceptAll(a).count() === 0, s"b-a for $q")
    }
  }

  test("OR / IN / NOT_IN compile identically in both compilers and match ground truth") {
    val orQ = StructuredQuery(where = Some(OrFilter(Seq(
      FieldFilter("event_type", Op.Eq, Str("error")),
      FieldFilter("k", Op.Gt, I64(90))))))
    val inQ = StructuredQuery(where = Some(
      FieldFilter("event_type", Op.In, Arr(Seq(Str("signup"), Str("error"))))))
    val notInQ = StructuredQuery(where = Some(
      FieldFilter("k", Op.NotIn, Arr(Seq(I64(0), I64(1), I64(2))))))
    Seq(orQ, inQ, notInQ).foreach { q =>
      val a = DocStore.query(coll, q)
      val b = DocStore.queryFused(coll, q)
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0, s"$q")
    }
    val orWant = events.filter(col("event_type") === "error" ||
      get_json_object(col("props"), "$.k").cast("long") > 90).count()
    assert(DocStore.query(coll, orQ).count() === orWant && orWant > 0)
    val inWant = events.filter(col("event_type").isin("signup", "error")).count()
    assert(DocStore.query(coll, inQ).count() === inWant && inWant > 0)
    val notInWant = events.filter(
      !get_json_object(col("props"), "$.k").cast("long").isin(0, 1, 2)).count()
    assert(DocStore.query(coll, notInQ).count() === notInWant && notInWant > 0)
    // ArrayValue constraints from the proto: non-empty, <= 10, one type
    intercept[IllegalArgumentException](FieldValue.Arr(Nil))
    intercept[IllegalArgumentException](FieldValue.Arr((0 to 10).map(i => I64(i.toLong))))
    intercept[IllegalArgumentException](FieldValue.Arr(Seq(I64(1), Str("x"))))
  }

  test("FilterJson parses or-composites and array operands") {
    val f = FilterJson.parse(
      """{"or":[{"field":"city","op":"==","value":"sf"},
        |       {"and":[{"field":"age","op":">","value":30},
        |               {"field":"tag","op":"in","value":["a","b"]}]}]}""".stripMargin)
    assert(f === Some(OrFilter(Seq(
      FieldFilter("city", Op.Eq, Str("sf")),
      AndFilter(Seq(
        FieldFilter("age", Op.Gt, I64(30)),
        FieldFilter("tag", Op.In, Arr(Seq(Str("a"), Str("b"))))))))))
  }

  test("orderBy sorts typed keys numerically with Firestore _id appending") {
    val q = StructuredQuery(
      where = Some(FieldFilter("value", Op.Gt, Dbl(150.0))),
      select = Seq("k"),
      orderBy = Seq(Order("k", desc = true, keyType = I64(0))),
      limit = Some(30))
    Seq(DocStore.query(coll, q), DocStore.queryFused(coll, q)).foreach { df =>
      val rows = df.collect().map(r => (r.getAs[String]("k").toLong, r.getLong(0)))
      assert(rows.length === 30)
      // numeric descending (a lexicographic sort would put "9" above "87")
      assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.reverse.toSeq)
      // _id appended with the last order's direction: within equal k,
      // ids descend
      rows.groupBy(_._1).values.filter(_.length > 1).foreach { g =>
        assert(g.map(_._2).toSeq === g.map(_._2).sorted.reverse.toSeq)
      }
    }
  }

  test("offset pages past the first rows, before limit") {
    def q(off: Option[Int]) = StructuredQuery(
      where = Some(FieldFilter("event_type", Op.Eq, Str("view"))),
      orderBy = Seq(Order("k", keyType = I64(0))),
      offset = off, limit = Some(50))
    val all = DocStore.queryFused(coll, q(None)).collect().map(_.getLong(0))
    val paged = DocStore.queryFused(coll, q(Some(10))).collect().map(_.getLong(0))
    assert(paged.length === 50)
    assert(paged.take(40).toSeq === all.drop(10).toSeq)
    // non-fused path agrees
    val paged2 = DocStore.query(coll, q(Some(10))).collect().map(_.getLong(0))
    assert(paged2.toSeq === paged.toSeq)
  }

  test("op parser accepts the reference's spellings") {
    assert(Op.parse("==") === Op.Eq)
    assert(Op.parse(">=") === Op.Ge)
    assert(Op.parse("array-contains") === Op.ArrayContains)
    intercept[IllegalArgumentException](Op.parse("~="))
  }

  test("nested dotted paths: fused equals per-field on a nested fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, """{"meta":{"k":5,"tag":"a"},"t":"x","arr":{"tags":["p","q"]}}"""),
      (2L, """{"meta":{"k":50,"tag":"b"},"t":"y","arr":{"tags":["q"]}}"""),
      (3L, """{"meta":{"k":7,"tag":"a"},"t":"x","arr":{"tags":[]}}"""),
      (4L, """{"t":"x"}"""),
      (5L, """{"meta":{"k":90},"t":"z","arr":{"tags":["p"]}}""")
    ).toDF("_id", "doc")
    val c = DocCollection("nested", docs)
    val qs = Seq(
      StructuredQuery(where = Some(FieldFilter("meta.k", Op.Ge, I64(7))),
        select = Seq("meta.k", "meta.tag")),
      StructuredQuery(where = Some(OrFilter(Seq(
        FieldFilter("meta.tag", Op.Eq, Str("a")),
        FieldFilter("t", Op.Eq, Str("z"))))),
        orderBy = Seq(Order("meta.k", keyType = I64(0))), limit = Some(3)),
      StructuredQuery(where = Some(FieldFilter("arr.tags", Op.ArrayContains, Str("p")))),
      // prefix conflict: "meta" selected whole while "meta.k" is filtered —
      // the struct wins the fused schema, the whole-object projection
      // falls back to the per-field extractor
      StructuredQuery(where = Some(FieldFilter("meta.k", Op.Gt, I64(6))),
        select = Seq("meta", "meta.k")))
    qs.foreach { q =>
      val a = DocStore.query(c, q)
      val b = DocStore.queryFused(c, q)
      assert(a.columns.toSeq === b.columns.toSeq, s"cols for $q")
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0, s"$q")
    }
    val got = DocStore.queryFused(c,
      StructuredQuery(where = Some(FieldFilter("meta.k", Op.Ge, I64(7)))))
      .select("_id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 5L))
    // dotted filters that can never match nested objects return nothing,
    // not wrong rows
    assert(DocStore.queryFused(c,
      StructuredQuery(where = Some(FieldFilter("meta.zzz", Op.Eq, I64(1))))).count() === 0)
  }

  test("latest-wins doc state has one row per key and no tombstones survive") {
    val latest = DocQueries.docStateLatest(spark, sf)
    assert(latest.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    val live = DocQueries.docStateTombstone(spark, sf)
    assert(live.filter(col("last_type") === "error").count() === 0)
    assert(live.count() <= latest.count())
  }
}
