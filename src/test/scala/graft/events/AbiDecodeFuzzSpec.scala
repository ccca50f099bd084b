package graft.events

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-fuzz of the ABI decoder against an independent Scala model.
  *
  * Random ABIs (1–5 events, shared param names with CONFLICTING types
  * across events to force merged-schema widening + per-branch re-parse)
  * × random props rows (missing fields, explicit nulls, JSON-escaping
  * hazards, unknown event types) — `decodeLong`'s (param, value_str,
  * indexed) rows and `decode`'s typed tables must both match values the
  * generator computed while BUILDING the JSON, never values read back
  * through the code under test.
  */
class AbiDecodeFuzzSpec extends SparkSpec {

  import AbiDecode._

  // -- generator model ----------------------------------------------------

  private val TypePool = Seq(
    "address", "string", "bool", "bytes32", "uint32", "uint64", "uint256",
    "int8", "int256", "uint8[]", "string[]", "uint256[]")

  /** A generated value: its compact-JSON fragment and the expected
    * reference rendering (param_to_value string form), null = absent. */
  private case class GenVal(json: String, expected: String)

  private def jsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\t' => "\\t" // Jackson's short escapes, so the model's
      case '\n' => "\\n" // rendering is byte-identical to to_json's
      case '\r' => "\\r"
      case '\b' => "\\b"
      case '\f' => "\\f"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def genScalar(rnd: Random, abiType: String): GenVal = abiType match {
    case "bool" =>
      val b = rnd.nextBoolean(); GenVal(b.toString, b.toString)
    case "uint8" | "uint32" | "int8" | "uint64" | "uint256" | "int256" =>
      // the reference's param_to_value renders EVERY Uint/Int width as a
      // QUOTED decimal string (Token::Uint/Int → Value::String,
      // event_processor.rs:222) — so the wire fragment is quoted; narrow
      // widths decode to LONG through the string wire schema and render
      // back to the same decimal text. Occasionally emit a bare number
      // instead (non-reference producers), which must decode identically.
      val v = abiType match {
        case "uint8" => rnd.nextInt(256).toLong.toString
        case "uint32" => rnd.nextInt(1 << 30).toLong.toString
        case "int8" => (rnd.nextInt(256) - 128).toLong.toString
        case "uint64" => (rnd.nextLong() & Long.MaxValue).toString
        case _ => BigInt(200, rnd).toString // wider than any SQL numeric
      }
      val bare = rnd.nextInt(4) == 0 && (abiType match {
        case "uint8" | "uint32" | "int8" | "uint64" => true
        case _ => false // wide ints: reference-only wire form
      })
      GenVal(if (bare) v else jsonEscape(v), v)
    case "address" | "bytes32" =>
      val hex = "0x" + Seq.fill(8)("0123456789abcdef"(rnd.nextInt(16))).mkString
      GenVal(jsonEscape(hex), hex)
    case "string" =>
      val tricky = Seq("plain", "with \"quotes\"", "back\\slash", "unié",
        "tab\tchar", "")
      val s = tricky(rnd.nextInt(tricky.length)) + rnd.nextInt(100)
      GenVal(jsonEscape(s), s)
    case other => throw new IllegalArgumentException(other)
  }

  private def gen(rnd: Random, abiType: String): GenVal =
    if (abiType.endsWith("[]")) {
      val elem = abiType.dropRight(2)
      val vs = Seq.fill(rnd.nextInt(4))(genScalar(rnd, elem))
      // the reference renders array elements through the same
      // param_to_value: EVERY int width and every string/address/bytes
      // becomes a quoted JSON string; only bool stays bare
      val quoted = elem != "bool"
      GenVal(vs.map(_.json).mkString("[", ",", "]"),
        if (quoted) vs.map(v => jsonEscape(v.expected)).mkString("[", ",", "]")
        else vs.map(_.expected).mkString("[", ",", "]"))
    } else genScalar(rnd, abiType)

  private val ScalarPool = TypePool.filterNot(_.endsWith("[]"))

  private def genAbi(rnd: Random): Seq[AbiEvent] = {
    val paramNames = Seq("p0", "p1", "p2", "p3", "p4", "p5")
    (0 until 1 + rnd.nextInt(4)).map { i =>
      val names = rnd.shuffle(paramNames).take(1 + rnd.nextInt(4))
      // types drawn independently per event: the same name can carry a
      // different type in another event → merged-schema conflict; ~1 in
      // 8 params is a tuple with 1-3 scalar components
      AbiEvent(s"E$i", names.map { n =>
        if (rnd.nextInt(8) == 0)
          AbiParam(n, "tuple", rnd.nextBoolean(),
            (0 until 1 + rnd.nextInt(3)).map(j =>
              AbiParam(s"c$j", ScalarPool(rnd.nextInt(ScalarPool.length)), false)))
        else
          AbiParam(n, TypePool(rnd.nextInt(TypePool.length)), rnd.nextBoolean())
      })
    }
  }

  /** Positional-array JSON for a tuple param (the reference's
    * Token::Tuple rendering) + per-component expected typed renderings.
    * decodeLong passes the raw text through (merged StringType), so
    * `expected` is the exact JSON fragment. */
  private def genTuple(rnd: Random, p: AbiParam): (GenVal, Seq[String]) = {
    val comps = p.components.map(c => genScalar(rnd, c.abiType))
    val json = comps.map(_.json).mkString("[", ",", "]")
    (GenVal(json, json), comps.map(_.expected))
  }

  test("decodeLong and decode match the generator's model on 60 random ABIs") {
    val rnd = new Random(20260813L)
    for (trial <- 0 until 12) {
      val abi = genAbi(rnd)
      val byName = abi.map(e => e.name -> e).toMap
      // rows: (event_id, event_type, props_json, param -> expected)
      // rows: (id, event, json, param→expected, tupleParam→component expecteds)
      val rows = (0 until 40).map { id =>
        val evName =
          if (rnd.nextInt(10) == 0) "UNKNOWN"
          else abi(rnd.nextInt(abi.length)).name
        val fields = byName.get(evName).map(_.params).getOrElse(Nil).flatMap { p =>
          rnd.nextInt(10) match {
            case 0 => None // absent field → null decode
            case 1 => Some((p.name, GenVal("null", null), Seq.empty[String]))
            case _ if p.abiType == "tuple" && p.components.nonEmpty =>
              val (gv, comps) = genTuple(rnd, p)
              Some((p.name, gv, comps))
            case _ => Some((p.name, gen(rnd, p.abiType), Seq.empty[String]))
          }
        }
        val json = fields.map { case (n, v, _) => jsonEscape(n) + ":" + v.json }
          .mkString("{", ",", "}")
        (id.toLong, evName, json,
          fields.map(f => f._1 -> f._2).toMap,
          fields.collect { case (n, _, cs) if cs.nonEmpty => n -> cs }.toMap)
      }
      val df = spark.createDataFrame(rows.map(r => (r._1, r._2, r._3)))
        .toDF("event_id", "event_type", "props")

      // ---- decodeLong vs model ----
      val expectedLong = rows.flatMap { case (id, evName, _, model, _) =>
        byName.get(evName).toSeq.flatMap(_.params.map { p =>
          (id, evName, p.name,
            model.get(p.name).map(_.expected).orNull,
            if (p.indexed) 1L else 0L)
        })
      }.toSet
      val gotLong = decodeLong(df, abi).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4))).toSet
      assert(gotLong === expectedLong, s"decodeLong mismatch in trial $trial (abi=$abi)")

      // ---- decode (typed tables) vs model, re-rendered per type ----
      val typed = decode(df, abi)
      for (ev <- abi) {
        val t = typed(ev.name)
        // render every typed column (incl. tuple component columns) back
        // to the reference string form with the SAME Spark kernels the
        // model targets
        val colNames = ev.params.flatMap { p =>
          p.name +: (if (p.abiType == "tuple")
            p.components.map(c => s"${p.name}_${c.name}") else Nil)
        }
        // reference JSON rendering of a typed column: long arrays cast
        // back to string arrays first (quoted decimal elements)
        def quotedForm(t: org.apache.spark.sql.types.DataType)
            : org.apache.spark.sql.types.DataType = t match {
          case org.apache.spark.sql.types.ArrayType(e, n) =>
            org.apache.spark.sql.types.ArrayType(quotedForm(e), n)
          case org.apache.spark.sql.types.LongType =>
            org.apache.spark.sql.types.StringType
          case o => o
        }
        val rendered = t.select(col("event_id") +: ev.params.flatMap { p =>
          val main = (sparkType(p.abiType) match {
            case a: org.apache.spark.sql.types.ArrayType =>
              to_json(col(p.name).cast(quotedForm(a)))
            case _ => col(p.name).cast("string")
          }).as(p.name)
          main +: (if (p.abiType == "tuple")
            p.components.map(c =>
              col(s"${p.name}_${c.name}").cast("string")
                .as(s"${p.name}_${c.name}"))
          else Nil)
        }: _*).collect().map(r =>
          r.getLong(0) -> colNames.zipWithIndex.map { case (n, i) =>
            n -> r.getString(i + 1)
          }.toMap).toMap
        for ((id, evName, _, model, tupleComps) <- rows if evName == ev.name) {
          val got = rendered(id)
          for (p <- ev.params) {
            assert(got(p.name) === model.get(p.name).map(_.expected).orNull,
              s"typed decode mismatch trial=$trial event=${ev.name} param=${p.name} id=$id")
            if (p.abiType == "tuple") {
              val comps = tupleComps.get(p.name)
              p.components.zipWithIndex.foreach { case (c, i) =>
                assert(got(s"${p.name}_${c.name}") ===
                  comps.map(_(i)).orNull,
                  s"tuple component mismatch trial=$trial event=${ev.name} " +
                    s"param=${p.name}.${c.name} id=$id")
              }
            }
          }
        }
      }
      // unknown event types never surface
      assert(!gotLong.exists(_._2 == "UNKNOWN"))
    }
  }
}
