package graft.docstore

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property fuzz of the JSON filter parser: render random
  * filter trees (the same `DocFuzz` generator the compiler fuzzers use)
  * into the reference's filter-JSON syntax, parse them back, and demand
  * structural equality. This pins `Op.parse`'s spellings as the exact
  * inverse of the renderer and the value typing (long / double / bool /
  * string / array operands) across arbitrary and/or nesting — the parser
  * is an API surface (queryDoc SDK), so a silent mis-parse would corrupt
  * queries without any compiler fuzz noticing. No SparkSession needed.
  */
class FilterJsonFuzzSpec extends AnyFunSuite {
  import FieldValue._

  private def renderOp(op: Op): String = op match {
    case Op.Eq => "=="
    case Op.Neq => "!="
    case Op.Lt => "<"
    case Op.Le => "<="
    case Op.Gt => ">"
    case Op.Ge => ">="
    case Op.ArrayContains => "array-contains"
    case Op.In => "in"
    case Op.NotIn => "not-in"
    case Op.ArrayContainsAny => "array-contains-any"
    case Op.Regex => "~"
  }

  private def renderValue(v: FieldValue): String = v match {
    case I64(x) => x.toString
    case Dbl(x) => x.toString // quarters: exact decimal text round-trips
    case Bool(x) => x.toString
    case Str(x) => "\"" + x + "\"" // vocab is escape-free ASCII
    case Arr(xs) => xs.map(renderValue).mkString("[", ",", "]")
  }

  private def renderUnaryOp(op: UnaryOp): String = op match {
    case UnaryOp.IsNull => "is-null"
    case UnaryOp.IsNan => "is-nan"
    case UnaryOp.IsNotNull => "is-not-null"
    case UnaryOp.IsNotNan => "is-not-nan"
  }

  private def render(f: Filter): String = f match {
    case FieldFilter(field, op, v) =>
      s"""{"field":"$field","op":"${renderOp(op)}","value":${renderValue(v)}}"""
    case UnaryFilter(field, op) => // no value member — unary is one-field
      s"""{"field":"$field","op":"${renderUnaryOp(op)}"}"""
    case AndFilter(fs) => fs.map(render).mkString("""{"and":[""", ",", "]}")
    case OrFilter(fs) => fs.map(render).mkString("""{"or":[""", ",", "]}")
  }

  /** The parser reads degenerate scalar membership operands (`"value":3`
    * for `in`) as the scalar, not a 1-element array — normalize the
    * expectation the same way the generator's degenerate case arrives. */
  test("1000 random filter trees survive the JSON round-trip unchanged") {
    val r = new Random(20260813L)
    for (i <- 0 until 1000) {
      val f = DocFuzz.genFilter(r, 0)
      val parsed = FilterJson.parse(render(f))
      assert(parsed === Some(f), s"case$i: ${render(f)}")
    }
  }

  test("parser rejections stay loud: bad op, missing field, empty composite") {
    intercept[IllegalArgumentException](
      FilterJson.parse("""{"field":"a","op":"=","value":1}"""))
    intercept[IllegalArgumentException](
      FilterJson.parse("""{"op":"==","value":1}"""))
    intercept[IllegalArgumentException](
      FilterJson.parse("""{"and":[]}"""))
    // unary ops are one-field filters: a value member is malformed
    intercept[IllegalArgumentException](
      FilterJson.parse("""{"field":"a","op":"is-null","value":1}"""))
    // and the non-unary ops still require one
    intercept[IllegalArgumentException](
      FilterJson.parse("""{"field":"a","op":"=="}"""))
  }
}
