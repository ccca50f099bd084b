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
    o \ "and" match {
      case JArray(fs) =>
        if (fs.isEmpty) throw new IllegalArgumentException("filters is empty")
        Some(AndFilter(fs.map {
          case f: JObject => parseField(f)
          case _ => throw new IllegalArgumentException("composite member must be an object")
        }))
      case _ =>
        if (o.obj.isEmpty) None else Some(parseField(o))
    }
  }

  private def parseField(o: JObject): FieldFilter = {
    val field = o \ "field" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("field is required in filter json")
    }
    val op = o \ "op" match {
      case JString(s) => Op.parse(s)
      case _ => throw new IllegalArgumentException("op is required in filter json")
    }
    val value = o \ "value" match {
      case JInt(v) => FieldValue.I64(v.toLong)
      case JLong(v) => FieldValue.I64(v)
      case JDouble(v) => FieldValue.Dbl(v)
      case JBool(v) => FieldValue.Bool(v)
      case JString(v) => FieldValue.Str(v)
      case JNothing => throw new IllegalArgumentException("value is required in filter json")
      case other => throw new IllegalArgumentException(s"unsupported value $other")
    }
    FieldFilter(field, op, value)
  }
}
