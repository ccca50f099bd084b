package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JsonFieldState: the one-pass missing(0) / JSON-null(1) / value(2)
  * classifier behind UnaryFilter IS_NULL. Must agree with the
  * get_json_object + json_object_keys two-probe semantics on every
  * corner (QueryFuzzSpec fuzzes the compiled form; this pins the kernel
  * directly, incl. the codegen and SQL surfaces). */
class JsonFieldStateSpec extends SparkSpec {
  import spark.implicits._

  private def states(path: String, docs: (Long, String)*): Map[Long, Int] =
    docs.toSeq.toDF("id", "doc")
      .select($"id", GraftFunctions.json_field_state($"doc", path).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("top-level field: missing vs null vs every value shape") {
    val s = states("k",
      1L -> """{"k":null}""",
      2L -> """{"t":2}""",
      3L -> """{"k":7}""",
      4L -> """{"k":"NaN"}""",
      5L -> """{"k":""}""",
      6L -> """{"k":[1,2]}""",
      7L -> """{"k":{"x":1}}""",
      8L -> """{"a":{"k":9},"t":8}""", // nested k is NOT top-level k
      9L -> """not json at all""",
      10L -> """[1,2,3]""") // root not an object
    assert(s === Map(1L -> 1, 2L -> 0, 3L -> 2, 4L -> 2, 5L -> 2,
      6L -> 2, 7L -> 2, 8L -> 0, 9L -> 0, 10L -> 0))
  }

  test("dotted path: parent presence, scalar/array parents, deep nesting") {
    val s = states("m.deep.z",
      1L -> """{"m":{"deep":{"z":null}}}""",
      2L -> """{"m":{"deep":{"z":5}}}""",
      3L -> """{"m":{"deep":{}}}""",
      4L -> """{"m":{"deep":"flat"}}""", // scalar where object expected
      5L -> """{"m":[{"deep":{"z":1}}]}""", // array parent never matches
      6L -> """{"m":{"other":1},"deep":{"z":2}}""") // wrong nesting level
    assert(s === Map(1L -> 1, 2L -> 2, 3L -> 0, 4L -> 0, 5L -> 0, 6L -> 0))
  }

  test("early-exit does not misread sibling subtrees; first match wins") {
    val s = states("b",
      // a's subtree contains a "b" that must be skipped, not matched
      1L -> """{"a":{"b":1},"b":null}""",
      2L -> """{"a":[{"b":1},2],"b":3}""",
      3L -> """{"a":{"b":{"c":1}}}""")
    assert(s === Map(1L -> 1, 2L -> 2, 3L -> 0))
  }

  test("SQL surface: graft_json_field_state") {
    GraftExtensions.registerAll(spark)
    Seq((1L, """{"k":null}"""), (2L, """{}"""), (3L, """{"k":1}"""))
      .toDF("id", "doc").createOrReplaceTempView("jfs_docs")
    val got = spark.sql(
      "SELECT id, graft_json_field_state(doc, 'k') AS s FROM jfs_docs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((1L, 1), (2L, 0), (3L, 2)))
  }

  test("null doc yields null (null-intolerant), not a state") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("""{"k":1}""")))
      .toDF("id", "doc")
      .select($"id", GraftFunctions.json_field_state($"doc", "k").as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(rows === Map(1L -> -1, 2L -> 2))
  }
}
