package graft.docstore

import graft.SparkSpec
import graft.docstore.FieldValue._

class FilterJsonSpec extends SparkSpec {

  test("parses the reference's field-filter syntax") {
    val f = FilterJson.parse("""{"field":"author","op":"==","value":"Cixin-Liu"}""")
    assert(f === Some(FieldFilter("author", Op.Eq, Str("Cixin-Liu"))))
    val r = FilterJson.parse("""{"field":"rate","op":">=","value":4}""")
    assert(r === Some(FieldFilter("rate", Op.Ge, I64(4))))
  }

  test("parses composite and-filters") {
    val f = FilterJson.parse(
      """{"and":[{"field":"a","op":"==","value":1},
        |        {"field":"b","op":"<","value":2.5}]}""".stripMargin)
    assert(f === Some(AndFilter(Seq(
      FieldFilter("a", Op.Eq, I64(1)), FieldFilter("b", Op.Lt, Dbl(2.5))))))
  }

  test("empty object = no filter; bad input rejected like the reference") {
    assert(FilterJson.parse("{}") === None)
    intercept[IllegalArgumentException](FilterJson.parse("""{"and":[]}"""))
    intercept[IllegalArgumentException](FilterJson.parse("""{"field":"a","op":"~~","value":1}"""))
    intercept[IllegalArgumentException](FilterJson.parse("""{"field":"a","value":1}"""))
  }

  test("parsed filter executes end-to-end against a collection") {
    val coll = DocStore.eventsCollection(spark, sf)
    val f = FilterJson.parse(
      """{"and":[{"field":"event_type","op":"==","value":"purchase"},
        |        {"field":"k","op":">","value":50}]}""".stripMargin).get
    val got = DocStore.query(coll, StructuredQuery(where = Some(f))).count()
    import org.apache.spark.sql.functions._
    val want = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" &&
        get_json_object(col("props"), "$.k").cast("long") > 50).count()
    assert(got === want && got > 0)
  }

  test("SQL surface: graft functions callable after registration") {
    graft.functions.GraftExtensions.registerAll(spark)
    val cos = spark.sql(
      "SELECT graft_cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)))")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sh = spark.sql("SELECT graft_simhash64(array('a','b','c'))").head().getLong(0)
    val sh2 = spark.sql("SELECT graft_simhash64(array('a','b','c'))").head().getLong(0)
    assert(sh === sh2)
    assert(spark.sql("SELECT size(graft_shingle_hashes(array('a','b','c','d'), 3))")
      .head().getInt(0) === 2)
    // PQ surface: encode 4-dim vector with a 2×2-centroid codebook and
    // score it against its own LUT — ADC distance to itself must be the
    // minimum over code combinations (here: just non-negative and finite)
    val adc = spark.sql(
      """SELECT graft_pq_adc_dist(
        |  graft_pq_encode(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT), CAST(1 AS FLOAT)), cb, 2, 2),
        |  graft_pq_lut(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT), CAST(1 AS FLOAT)), cb, 2, 2))
        |FROM (SELECT array(CAST(0.7 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT), CAST(0.7 AS FLOAT),
        |                   CAST(0 AS FLOAT), CAST(0.7 AS FLOAT), CAST(0.7 AS FLOAT), CAST(0 AS FLOAT)) AS cb)
        |""".stripMargin).head().getDouble(0)
    assert(adc >= 0.0 && adc < 0.1, s"adc=$adc") // codes hit the matching centroids
    // aggregate surface: the analyzer wraps the bare AggregateFunction
    val hh = spark.sql(
      """SELECT graft_heavy_hitters(v, 16, 2) FROM VALUES (1L),(1L),(1L),(2L),(2L),(3L) AS t(v)""")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hh === Seq((1L, 3L), (2L, 2L)))
    assert(spark.sql("SELECT graft_bitmap_distinct(v) FROM VALUES (1L),(1L),(5L) AS t(v)")
      .head().getLong(0) === 2L)
  }
}
