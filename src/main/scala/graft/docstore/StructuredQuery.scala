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
  /** ARRAY_CONTAINS_ANY — the proto's declared-next op 9
    * (db3_database_v2.proto:277, between the implemented IN=8 and
    * NOT_IN=10): the doc's array field shares at least one element with
    * the ArrayValue operand. */
  case object ArrayContainsAny extends Op
  /** `~` regexp match — the EJDB2/JQL operator the reference's
    * query-string language exposes beyond the proto ops (JQL grammar;
    * partial match, like DuckDB `regexp_matches`). Patterns are
    * validated to an RE2-safe subset (no backreferences / lookaround)
    * so engine and oracle regex dialects agree — see
    * [[Op.validateRegex]]. */
  case object Regex extends Op

  /** Parse the reference's filter-op spelling (bson_util.rs:81-97;
    * in/not-in/array-contains-any use the Firestore spellings the proto
    * cites; `~` is the JQL regexp spelling). */
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
    case "array-contains-any" => ArrayContainsAny
    case "~" => Regex
    case other => throw new IllegalArgumentException(s"Invalid OP $other")
  }

  /** Restrict `~` patterns to the dialect-portable RE2 subset: Java's
    * engine accepts backreferences, lookaround and possessive
    * quantifiers that RE2 (DuckDB/Go/C++ oracles) rejects or — worse —
    * that backtrack catastrophically on adversarial docs. Rejecting
    * them keeps one pattern language across engine and oracle and
    * bounds match cost linearly in the doc size. */
  def validateRegex(pattern: String): String = {
    val banned = Seq(
      "(?=" -> "lookahead", "(?!" -> "negative lookahead",
      "(?<" -> "lookbehind", "\\k<" -> "named backreference")
    banned.foreach { case (tok, what) =>
      if (pattern.contains(tok))
        throw new IllegalArgumentException(s"regex $what is not RE2-safe: $pattern")
    }
    // numbered backreferences \1..\9 and possessive/reluctant-possessive
    // quantifiers (a*+) are Java-only
    if ("""\\[1-9]""".r.findFirstIn(pattern).isDefined)
      throw new IllegalArgumentException(s"regex backreference is not RE2-safe: $pattern")
    if ("""[*+?}]\+""".r.findFirstIn(pattern).isDefined)
      throw new IllegalArgumentException(s"possessive quantifier is not RE2-safe: $pattern")
    java.util.regex.Pattern.compile(pattern) // must at least compile
    pattern
  }
}

/** The proto's declared-next `UnaryFilter` (db3_database_v2.proto:127-129,
  * commented `// TODO: Support in the future P1 — UnaryFilter unary_filter
  * = 3;`) — Firestore's one-field, no-operand filter ops. Semantics over
  * SCHEMALESS JSON docs, pinned here and fuzzed in DocFuzz:
  *  - IsNull:     the field is PRESENT and its value is JSON null. A doc
  *                missing the field does not match (Firestore: missing
  *                fields match no filter).
  *  - IsNotNull:  the field is present with a non-null value.
  *  - IsNan:      the field's value, viewed as a double, is NaN (JSON has
  *                no NaN literal; the engine's writers serialize NaN as
  *                the string "NaN", which is what this matches).
  *  - IsNotNan:   the field is present, non-null, and NOT NaN — strings
  *                and other non-numeric values qualify (they are not NaN),
  *                matching the != -family rule that null never matches.
  */
sealed trait UnaryOp
object UnaryOp {
  case object IsNull extends UnaryOp
  case object IsNan extends UnaryOp
  case object IsNotNull extends UnaryOp
  case object IsNotNan extends UnaryOp

  /** Firestore REST spells these IS_NULL/IS_NAN/IS_NOT_NULL/IS_NOT_NAN;
    * the JSON filter syntax uses the kebab spellings alongside the
    * existing `array-contains` style. */
  def parse(s: String): UnaryOp = s match {
    case "is-null" => IsNull
    case "is-nan" => IsNan
    case "is-not-null" => IsNotNull
    case "is-not-nan" => IsNotNan
    case other => throw new IllegalArgumentException(s"Invalid unary OP $other")
  }
}

sealed trait Filter
final case class FieldFilter(field: String, op: Op, value: FieldValue) extends Filter
/** One-field, no-operand filter (see [[UnaryOp]]). */
final case class UnaryFilter(field: String, op: UnaryOp) extends Filter
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

/** Keyset cursor — the proto's declared-next `start_at`/`end_at`
  * (db3_database_v2.proto:380-407, Firestore `Cursor{values, before}`).
  * `values` aligns positionally with the query's `orderBy` terms (a
  * PREFIX is allowed, as in Firestore); `None` is the JSON-null/missing
  * key, which sorts FIRST ascending and LAST descending (Spark's
  * asc/desc defaults — i.e. null is the smallest value in the
  * underlying order, matching the BSON type order the reference uses).
  * `id` extends the tuple with the appended `_id` tiebreak so a page
  * boundary is a unique row and paging is zero-dup/zero-gap.
  * `inclusive` is Firestore's `before` flag re-phrased per bound:
  * start_at vs start_after, end_at vs end_before.
  *
  * Scale note: this is the O(page) replacement for `offset` paging —
  * the cursor compiles to one tuple-compare predicate evaluated at the
  * scan (a filter, fused into the same whole-stage-codegen pass as the
  * `where`), so page N costs the same scan as page 0 plus a top-N sort,
  * while OFFSET must order and discard every skipped row. */
final case class Cursor(
    values: Seq[Option[FieldValue]],
    id: Option[Long] = None,
    inclusive: Boolean = true)

/** Projection/limit semantics per the proto: empty select = all fields;
  * offset applies after where/order but before limit
  * (db3_database_v2.proto:327-338, declared-next `int32 offset`); limit
  * applies after all other constraints. Ordering follows the proto's
  * Firestore rules: the doc id (`__name__` analog `_id`) is appended to
  * every ordering with the direction of the last explicit order.
  * `startAt`/`endAt` are keyset cursors over the same ordering (see
  * [[Cursor]]); their `values` may not be longer than `orderBy`. */
final case class StructuredQuery(
    where: Option[Filter] = None,
    select: Seq[String] = Nil,
    limit: Option[Int] = None,
    orderBy: Seq[Order] = Nil,
    offset: Option[Int] = None,
    startAt: Option[Cursor] = None,
    endAt: Option[Cursor] = None) {
  require(startAt.forall(_.values.size <= orderBy.size),
    "start cursor has more values than orderBy terms")
  require(endAt.forall(_.values.size <= orderBy.size),
    "end cursor has more values than orderBy terms")
}
