package graft.docstore

import scala.util.Random

import org.apache.spark.sql.DataFrame

/** Shared generator for the doc-store property fuzzers: random schemaless
  * documents (nested / flat / missing / null / type-mismatched fields) and
  * random StructuredQuery trees over them. Used by `QueryFuzzSpec` (fused
  * vs per-field compiler) and `GraftDBFuzzSpec` (indexed vs plain
  * execution over a real mutation log).
  *
  * One representational caveat shapes the generator: `get_json_object`
  * returns the unquoted text of a JSON value, so the per-field path
  * cannot distinguish the STRING "12" from the NUMBER 12 (it coerces
  * both), while the typed `from_json` path is token-strict (a quoted
  * "12" is not a long). The reference never faces this ambiguity — its
  * BSON values carry their type. Mismatch fixtures therefore use
  * NON-NUMERIC strings in typed fields (both paths agree: null), and
  * numeric-looking strings are excluded from the corpus vocabulary.
  */
object DocFuzz {
  import FieldValue._

  // no numeric-looking strings (see caveat above); "" exercises empties
  val vocab = Vector("alpha", "beta", "gamma", "delta", "x7", "")

  private def jstr(s: String): String = "\"" + s + "\""

  // exact quarter decimals: the literal text round-trips bit-exactly
  // through both string extraction and double parsing
  def quarters(r: Random): String =
    s"${r.nextInt(100)}.${Vector("0", "25", "5", "75")(r.nextInt(4))}"

  /** One random doc: every field independently missing / null /
    * type-mismatched / well-typed; `m` nests two levels. */
  def genDoc(r: Random): String = {
    val parts = Vector.newBuilder[String]
    r.nextInt(10) match {
      case 0 => // "a" missing
      case 1 => parts += "\"a\":null"
      case 2 => parts += "\"a\":" + jstr(vocab(r.nextInt(vocab.size))) // mistyped
      case _ => parts += "\"a\":" + r.nextInt(60)
    }
    r.nextInt(10) match {
      case 0 =>
      case 1 => parts += "\"b\":null"
      case 2 => parts += "\"b\":" + jstr(vocab(r.nextInt(vocab.size)))
      case _ => parts += "\"b\":" + quarters(r)
    }
    r.nextInt(8) match {
      case 0 =>
      case 1 => parts += "\"s\":null"
      case 2 => parts += "\"s\":" + r.nextInt(50) // number where string filtered
      case _ => parts += "\"s\":" + jstr(vocab(r.nextInt(vocab.size)))
    }
    r.nextInt(6) match {
      case 0 =>
      case 1 => parts += "\"flag\":" + r.nextInt(2) // number, strictly non-bool
      case _ => parts += "\"flag\":" + r.nextBoolean()
    }
    if (r.nextInt(10) != 0) {
      val m = Vector.newBuilder[String]
      if (r.nextInt(4) != 0) m += "\"x\":" + r.nextInt(40)
      if (r.nextInt(4) != 0) m += "\"y\":" + jstr(vocab(r.nextInt(vocab.size)))
      r.nextInt(4) match {
        case 0 =>
        case 1 => m += "\"deep\":" + jstr("flat") // scalar where object expected
        case _ => m += "\"deep\":{\"z\":" + r.nextInt(25) + "}"
      }
      parts += "\"m\":{" + m.result().mkString(",") + "}"
    } else if (r.nextBoolean()) {
      parts += "\"m\":" + jstr("notanobject") // scalar at the struct path
    }
    if (r.nextInt(4) != 0) {
      val tags = Vector.fill(r.nextInt(4))(jstr(vocab(r.nextInt(vocab.size - 1))))
      parts += "\"tags\":[" + tags.mkString(",") + "]"
    } else if (r.nextInt(3) == 0) {
      parts += "\"tags\":" + jstr("scalar") // scalar where array expected
    }
    // `nv` exists for the UNARY ops only (never typed-filtered: a quoted
    // "NaN" is a double to the raw probe but a null to the token-strict
    // fused slot, so it must stay out of scalarFields — see the caveat
    // above). Exercises all three null-ish states + NaN.
    r.nextInt(8) match {
      case 0 => // missing
      case 1 => parts += "\"nv\":null"
      case 2 | 3 => parts += "\"nv\":" + jstr("NaN")
      case 4 => parts += "\"nv\":" + jstr(vocab(r.nextInt(vocab.size)))
      case _ => parts += "\"nv\":" + r.nextInt(30)
    }
    if (r.nextBoolean()) parts += "\"junk\":" + r.nextInt(5)
    "{" + parts.result().mkString(",") + "}"
  }

  sealed trait Kind
  case object KI64 extends Kind
  case object KDbl extends Kind
  case object KStr extends Kind
  case object KBool extends Kind

  val scalarFields: Vector[(String, Kind)] = Vector(
    "a" -> KI64, "b" -> KDbl, "s" -> KStr, "flag" -> KBool,
    "m.x" -> KI64, "m.y" -> KStr, "m.deep.z" -> KI64, "m" -> KStr)

  def genValue(k: Kind, r: Random): FieldValue = k match {
    case KI64 => I64(r.nextInt(60).toLong)
    case KDbl => Dbl(quarters(r).toDouble)
    case KStr => Str(vocab(r.nextInt(vocab.size)))
    case KBool => Bool(r.nextBoolean())
  }

  /** RE2-safe patterns over the vocab (and a few that match nothing /
    * everything / partially) for the `~` op. */
  val regexPatterns: Vector[String] = Vector(
    "^al", "a", "ta$", "(be|ga)", "x[0-9]", "l?pha", "a.*a", "^$",
    "^(alpha|delta)$", "[gd]")

  def genLeaf(r: Random): Filter = {
    r.nextInt(12) match {
      case 0 =>
        return FieldFilter("tags", Op.ArrayContains,
          Str(vocab(r.nextInt(vocab.size - 1))))
      case 1 => // ARRAY_CONTAINS_ANY (op 9): 1..3 operand values
        return FieldFilter("tags", Op.ArrayContainsAny,
          Arr(Vector.fill(1 + r.nextInt(3))(Str(vocab(r.nextInt(vocab.size - 1))))))
      case 2 => // `~` regexp over any field's raw text (both compilers
        // probe raw, so numeric fields are legal targets)
        return FieldFilter(scalarFields(r.nextInt(scalarFields.size))._1,
          Op.Regex, Str(regexPatterns(r.nextInt(regexPatterns.size))))
      case 3 => // UnaryFilter (proto unary_filter = 3): IS_NULL/IS_NAN and
        // negations over any field — incl. `nv` (the NaN-able fixture),
        // nested paths (parent presence probing) and `tags`/`m` (arrays /
        // objects at the probed path)
        val ufields = scalarFields.map(_._1) :+ "nv" :+ "tags"
        val uops = Vector(UnaryOp.IsNull, UnaryOp.IsNan,
          UnaryOp.IsNotNull, UnaryOp.IsNotNan)
        return UnaryFilter(ufields(r.nextInt(ufields.size)),
          uops(r.nextInt(uops.size)))
      case _ =>
    }
    val (f, k) = scalarFields(r.nextInt(scalarFields.size))
    val ops = k match {
      case KBool => Vector(Op.Eq, Op.Neq)
      case _ => Vector(Op.Eq, Op.Neq, Op.Lt, Op.Le, Op.Gt, Op.Ge, Op.In, Op.NotIn)
    }
    val op = ops(r.nextInt(ops.size))
    val v = op match {
      case Op.In | Op.NotIn =>
        if (r.nextInt(5) == 0) genValue(k, r) // degenerate single-value membership
        else Arr(Vector.fill(1 + r.nextInt(5))(genValue(k, r)))
      case _ => genValue(k, r)
    }
    FieldFilter(f, op, v)
  }

  def genFilter(r: Random, depth: Int): Filter =
    if (depth >= 2 || r.nextInt(10) < 6) genLeaf(r)
    else {
      val kids = Vector.fill(2 + r.nextInt(2))(genFilter(r, depth + 1))
      if (r.nextInt(5) < 3) AndFilter(kids) else OrFilter(kids)
    }

  def witness(k: Kind): FieldValue = k match {
    case KI64 => I64(0); case KDbl => Dbl(0); case KStr => Str("")
    case KBool => Bool(false)
  }

  def genQuery(r: Random): StructuredQuery = {
    val where = if (r.nextInt(10) == 0) None else Some(genFilter(r, 0))
    val select = r.shuffle(scalarFields.map(_._1) :+ "tags")
      .take(r.nextInt(4)).toSeq
    val orderKinds = r.shuffle(scalarFields).take(r.nextInt(3))
    val orderBy = orderKinds.map { case (f, k) =>
      Order(f, desc = r.nextBoolean(), keyType = witness(k))
    }.toSeq
    // keyset cursors: a prefix of the order keys (None = null/missing
    // key), optionally extended by the _id tiebreak when full-length
    def genCursor(): Cursor = {
      val nvals = 1 + r.nextInt(orderKinds.size)
      val values = orderKinds.take(nvals).map { case (_, k) =>
        if (r.nextInt(4) == 0) None else Some(genValue(k, r))
      }.toSeq
      val id = if (nvals == orderKinds.size && r.nextBoolean())
        Some(r.nextInt(200).toLong) else None
      Cursor(values, id, inclusive = r.nextBoolean())
    }
    val startAt =
      if (orderKinds.nonEmpty && r.nextInt(3) == 0) Some(genCursor()) else None
    val endAt =
      if (orderKinds.nonEmpty && r.nextInt(3) == 0) Some(genCursor()) else None
    val offset = if (r.nextInt(4) == 0) Some(r.nextInt(15)) else None
    val limit = if (r.nextInt(3) == 0) Some(1 + r.nextInt(40)) else None
    StructuredQuery(where, select, limit, orderBy, offset, startAt, endAt)
  }

  /** Canonical multiset view: (schema, sorted stringified rows). Row order
    * is compared as a multiset — wherever order matters (orderBy / offset
    * / limit) both compilers append the `_id` tiebreak, so the surviving
    * row SET is already deterministic. */
  def canon(df: DataFrame): (Seq[String], Seq[String]) =
    (df.columns.toSeq,
      df.collect().toSeq.map(_.toSeq.map(String.valueOf).mkString("")).sorted)
}
