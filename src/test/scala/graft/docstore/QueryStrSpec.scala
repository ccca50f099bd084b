package graft.docstore

import graft.SparkSpec
import graft.docstore.FieldValue._
import QueryStr.ParsedQuery

class QueryStrSpec extends SparkSpec {

  test("the SDK's own query strings parse") {
    // sdk/tests/client_v2.test.ts cases
    assert(QueryStr.parse("/[city = beijing]") ===
      ParsedQuery(StructuredQuery(Some(FieldFilter("city", Op.Eq, Str("beijing")))), false))
    assert(QueryStr.parse("/* | limit 1") ===
      ParsedQuery(StructuredQuery(limit = Some(1)), false))
    assert(QueryStr.parse("/[age = :age]", Map("age" -> I64(20))) ===
      ParsedQuery(StructuredQuery(Some(FieldFilter("age", Op.Eq, I64(20)))), false))
    assert(QueryStr.parse("/{age}") ===
      ParsedQuery(StructuredQuery(select = Seq("age")), false))
    assert(QueryStr.parse("/* | count ") ===
      ParsedQuery(StructuredQuery(), true))
    assert(QueryStr.parse("/* |/{firstName} ") ===
      ParsedQuery(StructuredQuery(select = Seq("firstName")), false))
  }

  test("conjunctions, typed literals, all ops") {
    val p = QueryStr.parse("""/[a > 1] and /[b <= 2.5] /[c != 'x'] | limit 7""")
    assert(p === ParsedQuery(StructuredQuery(
      Some(AndFilter(Seq(
        FieldFilter("a", Op.Gt, I64(1)),
        FieldFilter("b", Op.Le, Dbl(2.5)),
        FieldFilter("c", Op.Neq, Str("x"))))),
      limit = Some(7)), false))
    assert(QueryStr.parse("/[ok = true]").sq.where ===
      Some(FieldFilter("ok", Op.Eq, Bool(true))))
  }

  test("errors: unbound placeholder, bad apply, empty") {
    intercept[IllegalArgumentException](QueryStr.parse("/[a = :missing]"))
    intercept[IllegalArgumentException](QueryStr.parse("/* | frobnicate"))
    intercept[IllegalArgumentException](QueryStr.parse("   "))
  }

  test("~ parses RE2-safe patterns and rejects Java-only constructs") {
    val p = QueryStr.parse("/[city ~ ^be(i|j)ing$] | limit 3")
    assert(p.sq.where === Some(FieldFilter("city", Op.Regex,
      FieldValue.Str("^be(i|j)ing$"))))
    // lookahead, backreference, possessive quantifier: all RE2-unsafe
    intercept[IllegalArgumentException](QueryStr.parse("/[city ~ (?=x)y]"))
    intercept[IllegalArgumentException](QueryStr.parse("/[city ~ (a)\\1]"))
    intercept[IllegalArgumentException](QueryStr.parse("/[city ~ a*+b]"))
  }

  test("asc/desc/skip applies parse into orderBy/offset") {
    val p = QueryStr.parse("/[age > 10] | asc /city | desc age | skip 5 | limit 2")
    assert(p.sq.orderBy === Seq(Order("city"), Order("age", desc = true)))
    assert(p.sq.offset === Some(5))
    assert(p.sq.limit === Some(2))
    intercept[IllegalArgumentException](QueryStr.parse("/* | asc "))
  }

  test("query string executes end-to-end through GraftDB") {
    val db = new graft.api.GraftDB(spark,
      java.nio.file.Files.createTempDirectory("graftdb-qs").toString)
    db.createCollection("d", "profiles")
    db.addDocuments("d", "profiles", Seq(
      """{"city":"beijing","age":20}""",
      """{"city":"beijing","age":30}""",
      """{"city":"paris","age":20}"""))
    assert(db.queryStr("d", "profiles", "/[city = beijing]").count() === 2)
    assert(db.queryStr("d", "profiles", "/[age = :age]",
      Map("age" -> I64(20))).count() === 2)
    assert(db.queryStr("d", "profiles", "/* | count").head().getLong(0) === 3)
    val proj = db.queryStr("d", "profiles", "/[city = beijing] | /{age} | limit 1")
    assert(proj.columns.toSeq === Seq("_id", "age"))
    assert(proj.count() === 1)
  }
}
