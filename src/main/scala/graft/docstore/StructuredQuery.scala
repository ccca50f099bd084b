package graft.docstore

/** Firestore-style structured query ADT, re-expressing the reference's
  * query surface (reference: src/proto/proto/db3_database_v2.proto:111-420
  * `StructuredQuery` — FieldFilter ops EQUAL/NOT_EQUAL/LT/LE/GT/GE/
  * ARRAY_CONTAINS, CompositeFilter AND, Projection, Limit; and
  * src/base/src/bson_util.rs:62-146 `filter_from_json_value` which parses
  * the JSON filter syntax `{field, op, value}` / `{and: [...]}`).
  *
  * The reference executes these against EJDB2 B-trees; here the same ADT
  * compiles to Spark `Column` predicates over a JSON document column, so
  * Catalyst can push what's pushable and whole-stage-codegen the rest.
  */
sealed trait FieldValue
object FieldValue {
  final case class I64(v: Long) extends FieldValue
  final case class Dbl(v: Double) extends FieldValue
  final case class Str(v: String) extends FieldValue
  final case class Bool(v: Boolean) extends FieldValue

  /** ArrayValue operand for IN / NOT_IN (the proto requires non-empty,
    * ≤ 10 values, db3_database_v2.proto:260-287). Elements must share one
    * scalar type. */
  final case class Arr(vs: Seq[FieldValue]) extends FieldValue {
    require(vs.nonEmpty && vs.size <= 10, "ArrayValue must have 1..10 values")
    require(vs.forall(_.getClass == vs.head.getClass),
      "ArrayValue elements must share one type")
  }
}

sealed trait Op
object Op {
  case object Eq extends Op
  case object Neq extends Op
  case object Lt extends Op
  case object Le extends Op
  case object Gt extends Op
  case object Ge extends Op
  case object ArrayContains extends Op
  /** IN / NOT_IN — the proto's declared-next membership ops
    * (db3_database_v2.proto:260-287, commented `IN = 8` / `NOT_IN = 10`). */
  case object In extends Op
  case object NotIn extends Op

  /** Parse the reference's filter-op spelling (bson_util.rs:81-97;
    * in/not-in use the Firestore spellings the proto cites). */
  def parse(s: String): Op = s match {
    case "==" => Eq
    case "!=" => Neq
    case "<" => Lt
    case "<=" => Le
    case ">" => Gt
    case ">=" => Ge
    case "array-contains" => ArrayContains
    case "in" => In
    case "not-in" => NotIn
    case other => throw new IllegalArgumentException(s"Invalid OP $other")
  }
}

sealed trait Filter
final case class FieldFilter(field: String, op: Op, value: FieldValue) extends Filter
final case class AndFilter(filters: Seq[Filter]) extends Filter
/** OR composite — the proto's declared-next operator
  * (db3_database_v2.proto:143-145, commented `OR = 2`). */
final case class OrFilter(filters: Seq[Filter]) extends Filter

/** One ordering term (the proto's declared-next `Order` —
  * db3_database_v2.proto:340-363, commented `repeated Order order_by`).
  * `keyType` is a type witness for the JSON field (its value is ignored):
  * doc fields are schemaless strings until told otherwise, and ordering
  * "10" < "9" lexicographically would silently mis-sort numeric keys.
  * Defaults to string, matching the reference's bson ordering for
  * untyped keys. */
final case class Order(field: String, desc: Boolean = false,
    keyType: FieldValue = FieldValue.Str(""))

/** Projection/limit semantics per the proto: empty select = all fields;
  * offset applies after where/order but before limit
  * (db3_database_v2.proto:327-338, declared-next `int32 offset`); limit
  * applies after all other constraints. Ordering follows the proto's
  * Firestore rules: the doc id (`__name__` analog `_id`) is appended to
  * every ordering with the direction of the last explicit order. */
final case class StructuredQuery(
    where: Option[Filter] = None,
    select: Seq[String] = Nil,
    limit: Option[Int] = None,
    orderBy: Seq[Order] = Nil,
    offset: Option[Int] = None)
