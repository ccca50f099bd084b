package graft.docstore

import graft.SparkSpec
import graft.docstore.FieldValue._
import scala.util.Random

/** Grammar-driven fuzz of the SDK query-string parser: random VALID
  * query strings are generated together with the StructuredQuery they
  * must parse to (the generator builds the expectation while emitting
  * the text, never by re-reading it through the parser), across random
  * whitespace, `and` connectors, quote styles, value types, bound
  * `:params`, chained applies, and mixed-case apply keywords.
  */
class QueryStrFuzzSpec extends SparkSpec {

  private val fields = Seq("age", "city", "meta.k", "score_1", "ok")
  private val ops = Seq(
    ("=", Op.Eq), ("!=", Op.Neq), (">", Op.Gt), (">=", Op.Ge),
    ("<", Op.Lt), ("<=", Op.Le))

  /** One random literal: its text form and the FieldValue it parses to. */
  private def genValue(rnd: Random): (String, FieldValue) =
    rnd.nextInt(6) match {
      case 0 => val n = rnd.nextLong() % 100000; (n.toString, I64(n))
      case 1 => val d = rnd.nextInt(1000) / 8.0; (d.toString, Dbl(d))
      case 2 => val b = rnd.nextBoolean(); (b.toString, Bool(b))
      case 3 => val s = s"word${rnd.nextInt(100)}"; (s, Str(s)) // bareword
      case 4 => val s = s"two w${rnd.nextInt(10)}"; (s"'$s'", Str(s))
      case _ => val s = s"q${rnd.nextInt(10)}"; ("\"" + s + "\"", Str(s))
    }

  private def ws(rnd: Random): String = " " * rnd.nextInt(3)

  test("500 random grammar-generated query strings parse to their built AST") {
    val rnd = new Random(424242L)
    for (trial <- 0 until 500) {
      val sb = new StringBuilder
      var expFilters = Vector.empty[Filter]
      var expSelect = Vector.empty[String]
      var params = Map.empty[String, FieldValue]

      // `~` patterns: RE2-safe, bareword-parseable (no spaces/quotes);
      // char classes and alternation exercise the bracket-aware lexer
      val pats = Seq("^c[0-4]$", "wo.d", "(a|b)x?", "q\\d", "x+", "^word1")
      val nFilters = rnd.nextInt(4)
      if (nFilters == 0) sb.append("/*")
      else (0 until nFilters).foreach { i =>
        if (i > 0 && rnd.nextBoolean()) sb.append(" and ")
        val f = fields(rnd.nextInt(fields.length))
        if (rnd.nextInt(6) == 0) { // regexp filter
          val pat = pats(rnd.nextInt(pats.length))
          sb.append(s"/[${ws(rnd)}$f${ws(rnd)}~${ws(rnd)}$pat${ws(rnd)}]")
          expFilters :+= FieldFilter(f, Op.Regex, Str(pat))
        } else if (rnd.nextInt(5) == 0) { // JQL membership: in / ni / not in
          val spell = Seq("in", "ni", "not in", "not  in")(rnd.nextInt(4))
          val op = if (spell == "in") Op.In else Op.NotIn
          // one element type per operand (ArrayValue is homogeneous)
          val mk: () => (String, FieldValue) = rnd.nextInt(3) match {
            case 0 => () => { val x = rnd.nextInt(500).toLong; (x.toString, I64(x)) }
            case 1 => () => { val s = s"word${rnd.nextInt(50)}"; (s"'$s'", Str(s)) }
            case _ => () => { val d = rnd.nextInt(100) / 4.0; (d.toString, Dbl(d)) }
          }
          val elems = Vector.fill(1 + rnd.nextInt(4))(mk())
          val arrTxt = elems.map(_._1).mkString("[", s",${ws(rnd)}", "]")
          // word ops need a real separator before them (else they'd be
          // lexed into the field name)
          sb.append(s"/[${ws(rnd)}$f $spell${ws(rnd)}$arrTxt${ws(rnd)}]")
          expFilters :+= FieldFilter(f, op, Arr(elems.map(_._2)))
        } else {
          val neqAsNot = rnd.nextInt(8) == 0 // `not =` spells !=
          val (opTxt, op) =
            if (neqAsNot) ("not =", Op.Neq) else ops(rnd.nextInt(ops.length))
          val (vTxt, v) =
            if (rnd.nextInt(5) == 0) { // bound parameter
              val pname = s"p$i"
              val (_, pv) = genValue(rnd)
              params += pname -> pv
              (s":$pname", pv)
            } else genValue(rnd)
          val sep = if (opTxt.head.isLetter) " " else ws(rnd)
          sb.append(s"/[${ws(rnd)}$f$sep$opTxt${ws(rnd)}$vTxt${ws(rnd)}]")
          expFilters :+= FieldFilter(f, op, v)
        }
      }
      // optional inline projection node
      if (rnd.nextInt(4) == 0) {
        val sel = rnd.shuffle(fields).take(1 + rnd.nextInt(2))
        sb.append(s"/{${sel.mkString(",")}}")
        expSelect ++= sel
      }
      // random applies, in order
      var expLimit: Option[Int] = None
      var expOffset: Option[Int] = None
      var expOrder = Vector.empty[Order]
      var expCount = false
      (0 until rnd.nextInt(4)).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 =>
            val n = rnd.nextInt(50); expLimit = Some(n)
            sb.append(s" | ${if (rnd.nextBoolean()) "limit" else "LIMIT"} $n")
          case 1 =>
            val n = rnd.nextInt(20); expOffset = Some(n)
            sb.append(s" | skip $n")
          case 2 =>
            val f = fields(rnd.nextInt(fields.length))
            val desc = rnd.nextBoolean()
            expOrder :+= Order(f, desc = desc)
            sb.append(s" | ${if (desc) "desc" else "asc"} ${if (rnd.nextBoolean()) "/" else ""}$f")
          case 3 =>
            expCount = true
            sb.append(" | count")
          case _ =>
            val sel = rnd.shuffle(fields).take(1)
            expSelect ++= sel
            sb.append(s" | /{${sel.mkString(",")}}")
        }
      }
      val q = sb.toString
      val got = QueryStr.parse(q, params)
      val expWhere = expFilters match {
        case Vector() => None
        case Vector(one) => Some(one)
        case many => Some(AndFilter(many))
      }
      val exp = QueryStr.ParsedQuery(
        StructuredQuery(expWhere, expSelect, expLimit, expOrder, expOffset),
        expCount)
      assert(got === exp, s"trial $trial: query <$q> params=$params")
    }
  }

  test("fuzzed queries execute identically via queryStr and the direct AST") {
    // parser-independence end-to-end: the same random query through
    // GraftDB.queryStr and through DocStore.query with the
    // generator-built AST must return the same rows
    val rnd = new Random(777L)
    val db = new graft.api.GraftDB(spark,
      java.nio.file.Files.createTempDirectory("qsfuzz").toString)
    db.createCollection("f", "docs")
    db.addDocuments("f", "docs", (0 until 60).map { i =>
      s"""{"age":${i % 13},"city":"c${i % 5}","ok":${i % 2 == 0}}"""
    })
    val coll = db.collection("f", "docs")
    for (_ <- 0 until 40) {
      val f = Seq("age", "city", "ok")(rnd.nextInt(3))
      val (opTxt, op) = ops(rnd.nextInt(ops.length))
      val (vTxt, v) = f match {
        case "age" => val n = rnd.nextInt(14).toLong; (n.toString, I64(n))
        case "city" => val s = s"c${rnd.nextInt(6)}"; (s"'$s'", Str(s))
        case _ => val b = rnd.nextBoolean(); (b.toString, Bool(b))
      }
      val viaStr = db.queryStr("f", "docs", s"/[$f $opTxt $vTxt]")
        .select("_id").collect().map(_.getLong(0)).sorted
      val viaAst = DocStore.query(coll,
        StructuredQuery(Some(FieldFilter(f, op, v))))
        .select("_id").collect().map(_.getLong(0)).sorted
      assert(viaStr.sameElements(viaAst), s"/[$f $opTxt $vTxt]")
    }
  }
}
