package graft.docstore

import scala.util.matching.Regex

/** Parser for the reference's user-visible query-string language — the
  * EJDB2/JQL subset its SDK exercises (reference: sdk/tests/
  * client_v2.test.ts:220-266 — `/[city = beijing]`, match-all with
  * `limit 1`, `/[age = :age]` with bound parameters, `/{age}`
  * projections, the match-all `count` apply; executed via
  * storage/src/doc_store.rs:177 `execute_query` + `set_placeholder`).
  *
  * Grammar subset (`STAR` = slash-asterisk match-all node):
  * {{{
  *   query  := node (('and')? node)* ('|' apply)*
  *   node   := STAR | '/[' field op value ']' | '/{' field (',' field)* '}'
  *   op     := '=' | '!=' | '>' | '>=' | '<' | '<='
  *   value  := number | 'str' | "str" | true | false | bareword | :param
  *   apply  := 'limit' N | 'skip' N | 'count' | '/{' fields '}'
  *           | 'asc' field | 'desc' field
  * }}}
  *
  * `asc`/`desc`/`skip` map to the proto's declared-next order_by/offset
  * surface (db3_database_v2.proto:327-363); sort keys parse as strings
  * unless the caller refines `Order.keyType` on the parsed query.
  */
object QueryStr {

  /** A parsed query: the structured form plus whether `| count` was
    * requested (count collapses the result to a single tally). */
  final case class ParsedQuery(sq: StructuredQuery, count: Boolean)

  // the value may itself contain one level of [...] (regex char classes
  // in `~` patterns, array literals of `in`/`ni` operands); anything else
  // stops at the node's closing bracket. JQL word ops: `in`, `ni`
  // (not-in) and the `not` negation prefix (`not in`, `not =`) — listed
  // BEFORE `ni`/`in` in the alternation so "not in" never half-matches
  // as op `ni` + value "t in …".
  private val filterRe: Regex =
    """\[\s*([A-Za-z_][\w.]*)\s*(!=|>=|<=|not\s+in|not\s+=|ni|in|=|>|<|~)\s*((?:[^\]\[]|\[[^\]]*\])+?)\s*\]""".r
  private val projRe: Regex = """\{\s*([^}]+)\s*\}""".r
  private val limitRe: Regex = """limit\s+(\d+)""".r
  private val skipRe: Regex = """skip\s+(\d+)""".r
  private val orderRe: Regex = """(?i)(asc|desc)\s+/?([A-Za-z_][\w.]*)""".r

  /** Split on the apply-pipe `|` only OUTSIDE `[...]` nodes — a `~`
    * pattern's alternation (`/[s ~ ^(a|b)]`) is part of the node, not a
    * section break. */
  private def splitTop(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '[' => depth += 1; cur += '['
      case ']' => depth = math.max(0, depth - 1); cur += ']'
      case '|' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result()
  }

  def parse(query: String, params: Map[String, FieldValue] = Map.empty): ParsedQuery = {
    val parts = splitTop(query).map(_.trim).filter(_.nonEmpty)
    if (parts.isEmpty) throw new IllegalArgumentException("empty query")

    var filters = Vector.empty[Filter]
    var select = Vector.empty[String]
    var limit: Option[Int] = None
    var offset: Option[Int] = None
    var orderBy = Vector.empty[Order]
    var count = false

    def parseNodeSection(s: String): Unit = {
      // strip leading '/', allow 'and' connectors and chained nodes
      val body = s.replaceAll("(?i)\\band\\b", " ")
      if (body.replace("/", "").trim == "*") return // match-all
      filterRe.findAllMatchIn(body).foreach { m =>
        val op = Op.parse(opSpelling(m.group(2)))
        // `in`/`ni` operands are JQL array literals `[v1, v2, …]`; a bare
        // value degenerates to single-element membership and a bound
        // placeholder may already be an Arr. Elements split on commas
        // (string elements containing commas are outside the JQL subset).
        def membershipValue(raw: String): FieldValue = {
          val t = raw.trim
          if (t.startsWith("[") && t.endsWith("]")) {
            val inner = t.substring(1, t.length - 1)
            // `in []` / `ni []` are the EMPTY set — "".split(",") would
            // yield [""], i.e. membership in {""}; short-circuit to the
            // empty Arr so the structured surface's emptyArrShortCircuit
            // (In [] = never, NotIn [] = always) applies.
            if (inner.trim.isEmpty) FieldValue.Arr(Vector.empty)
            else FieldValue.Arr(inner.split(",")
              .map(e => parseValue(e, params)).toVector)
          } else parseValue(t, params)
        }
        val v = (if (op == Op.In || op == Op.NotIn) membershipValue(m.group(3))
                 else parseValue(m.group(3), params)) match {
          // `~` operands are PATTERNS — numeric-looking literals like
          // /[s ~ 123] are still pattern strings, and the RE2-safe
          // validation runs at parse time so a bad pattern fails fast
          case FieldValue.Str(p) if op == Op.Regex =>
            FieldValue.Str(Op.validateRegex(p))
          case other if op == Op.Regex =>
            FieldValue.Str(Op.validateRegex(m.group(3).trim))
          case other => other
        }
        filters :+= FieldFilter(m.group(1), op, v)
      }
      projRe.findAllMatchIn(body).foreach { m =>
        select ++= m.group(1).split(",").map(_.trim).filter(_.nonEmpty)
      }
      if (filters.isEmpty && select.isEmpty && body.replace("/", "").trim.nonEmpty)
        throw new IllegalArgumentException(s"unparseable node: $s")
    }

    parseNodeSection(parts.head)
    parts.tail.foreach { apply =>
      apply.toLowerCase match {
        case a if a.startsWith("limit") =>
          limit = Some(limitRe.findFirstMatchIn(a)
            .getOrElse(throw new IllegalArgumentException(s"bad limit: $apply"))
            .group(1).toInt)
        case a if a.startsWith("skip") =>
          offset = Some(skipRe.findFirstMatchIn(a)
            .getOrElse(throw new IllegalArgumentException(s"bad skip: $apply"))
            .group(1).toInt)
        case a if a.startsWith("asc") || a.startsWith("desc") =>
          // match against the original-case text: field names are
          // case-sensitive JSON keys
          val m = orderRe.findFirstMatchIn(apply.trim)
            .getOrElse(throw new IllegalArgumentException(s"bad order: $apply"))
          orderBy :+= Order(m.group(2), desc = m.group(1).toLowerCase == "desc")
        case a if a == "count" => count = true
        case a if a.startsWith("/") || a.startsWith("{") => parseNodeSection(apply)
        case other => throw new IllegalArgumentException(s"unknown apply: $other")
      }
    }

    val where = filters match {
      case Vector() => None
      case Vector(one) => Some(one)
      case many => Some(AndFilter(many))
    }
    ParsedQuery(StructuredQuery(where, select, limit, orderBy, offset), count)
  }

  /** Map JQL spellings onto the canonical [[Op.parse]] spellings:
    * `=`/`in` pass through (with `=` doubled), `ni` is EJDB2's not-in,
    * and the `not` negation prefix composes with `in` and `=` — the two
    * ops whose negations exist as first-class Ops (`not ~` has no
    * negated-regex Op and fails fast). */
  private def opSpelling(s: String): String = s.replaceAll("\\s+", " ") match {
    case "=" => "=="
    case "in" => "in"
    case "ni" | "not in" => "not-in"
    case "not =" => "!="
    case other => other
  }

  private def parseValue(raw: String, params: Map[String, FieldValue]): FieldValue = {
    val v = raw.trim
    if (v.startsWith(":")) {
      val name = v.drop(1)
      params.getOrElse(name,
        throw new IllegalArgumentException(s"unbound placeholder :$name"))
    } else if ((v.startsWith("'") && v.endsWith("'") && v.length >= 2) ||
        (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)) {
      FieldValue.Str(v.substring(1, v.length - 1))
    } else if (v == "true" || v == "false") {
      FieldValue.Bool(v.toBoolean)
    } else if (v.matches("[-+]?\\d+")) {
      FieldValue.I64(v.toLong)
    } else if (v.matches("[-+]?\\d*\\.\\d+([eE][-+]?\\d+)?")) {
      FieldValue.Dbl(v.toDouble)
    } else {
      // barewords are strings in the SDK's examples: /[city = beijing]
      FieldValue.Str(v)
    }
  }
}
