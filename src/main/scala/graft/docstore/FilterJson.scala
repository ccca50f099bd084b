package graft.docstore

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parser for the reference's JSON filter syntax (reference:
  * src/base/src/bson_util.rs:147 `filter_from_json_value` and the
  * `queryDoc` SDK surface): `{"field":"a","op":"==","value":v}` or
  * `{"and":[{...},{...}]}`. Superset of the reference: it rejects `!=`
  * and non-`==` composite members (declared TODO there); both parse here.
  */
object FilterJson {

  def parse(json: String): Option[Filter] = JsonMethods.parse(json) match {
    case o: JObject => parseObj(o)
    case _ => throw new IllegalArgumentException("filter must be a JSON object")
  }

  private def parseObj(o: JObject): Option[Filter] = {
    def members(fs: List[JValue]): Seq[Filter] = {
      if (fs.isEmpty) throw new IllegalArgumentException("filters is empty")
      fs.map {
        case f: JObject => parseObj(f).getOrElse(
          throw new IllegalArgumentException("empty composite member"))
        case _ => throw new IllegalArgumentException("composite member must be an object")
      }
    }
    (o \ "and", o \ "or") match {
      case (JArray(fs), _) => Some(AndFilter(members(fs)))
      case (_, JArray(fs)) => Some(OrFilter(members(fs)))
      case _ =>
        if (o.obj.isEmpty) None else Some(parseField(o))
    }
  }

  private val unarySpellings =
    Set("is-null", "is-nan", "is-not-null", "is-not-nan")

  private def parseField(o: JObject): Filter = {
    val field = o \ "field" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("field is required in filter json")
    }
    val opStr = o \ "op" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("op is required in filter json")
    }
    // UnaryFilter (proto's declared-next unary_filter = 3): one field, no
    // operand — a `value` member is a malformed filter, not ignorable
    if (unarySpellings(opStr)) {
      if ((o \ "value") != JNothing)
        throw new IllegalArgumentException(s"unary op $opStr takes no value")
      return UnaryFilter(field, UnaryOp.parse(opStr))
    }
    val op = Op.parse(opStr)
    def scalar(v: JValue): FieldValue = v match {
      case JInt(x) => FieldValue.I64(x.toLong)
      case JLong(x) => FieldValue.I64(x)
      case JDouble(x) => FieldValue.Dbl(x)
      case JBool(x) => FieldValue.Bool(x)
      case JString(x) => FieldValue.Str(x)
      case other => throw new IllegalArgumentException(s"unsupported value $other")
    }
    val value = o \ "value" match {
      case JArray(vs) => FieldValue.Arr(vs.map(scalar)) // in / not-in operand
      case JNothing => throw new IllegalArgumentException("value is required in filter json")
      case v => scalar(v)
    }
    FieldFilter(field, op, value)
  }
}
