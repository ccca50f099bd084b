package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-event typed ABI decode — the reference indexer's core
  * capability (reference: src/event/src/event_processor.rs:98-206
  * `start`/`log_to_doc`/`param_to_value`; src/node/src/indexer_impl.rs:197
  * one document table per event type).
  *
  * The reference subscribes to EVM logs, matches each log's signature
  * against every event declared in a contract's ABI JSON, decodes the
  * matching event's params, and writes one JSON document per log into a
  * collection named after the event. Its `param_to_value` mapping is:
  * address → "0x"-hex string, uint/int → decimal string, bytes → hex
  * string, bool → bool, string → string, arrays/tuples → JSON arrays.
  *
  * The Spark re-expression: the ABI JSON is parsed once on the driver
  * into per-event `StructType`s; each event type decodes with ONE
  * `from_json` against its own typed schema (never N repeated
  * `get_json_object` scans), and the decode dispatches on the event-type
  * column inside a single whole-stage-codegen projection. Per-type typed
  * tables come out of `decode` (the analog of one collection per event);
  * `decodeLong` is the single-scan union view with per-param rows.
  *
  * Scale posture: `decodeLong` is one pass over the log with ONE
  * merged-schema `from_json` per row; the per-event dispatch is a pure
  * `when`/`getField`/`cast` projection that stays inside whole-stage
  * codegen (plan-pinned in `PlanPinsSpec`). `decode`'s per-type frames
  * filter on the type column, which reaches the parquet scan as a pushed
  * filter (row-group pruning when the log is type-partitioned, as the
  * reference's per-type tables are).
  */
object AbiDecode {

  /** One declared event input (`{indexed, name, type}` in the ABI;
    * tuples additionally carry their `components`). */
  final case class AbiParam(name: String, abiType: String, indexed: Boolean,
      components: Seq[AbiParam] = Nil)

  /** One `"type": "event"` ABI entry. */
  final case class AbiEvent(name: String, params: Seq[AbiParam]) {
    def schema: StructType =
      StructType(params.map(p => StructField(p.name, sparkType(p.abiType))))
    /** Parse-side schema: integer fields as strings (see [[wireOf]]). */
    def wireSchema: StructType =
      StructType(params.map(p => StructField(p.name, wireOf(sparkType(p.abiType)))))
  }

  /** Parse an ABI JSON (the contract-level array) into its declared,
    * non-anonymous events. Driver-side config parse of a small string —
    * json4s, same as the doc-mask merge path. */
  def parseAbi(abiJson: String): Seq[AbiEvent] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val entries = JsonMethods.parse(abiJson) match {
      case JArray(xs) => xs
      case _ => throw new IllegalArgumentException("ABI must be a JSON array")
    }
    entries.flatMap { e =>
      (e \ "type", e \ "anonymous") match {
        case (JString("event"), anon) if anon != JBool(true) =>
          val name = e \ "name" match {
            case JString(s) => s
            case _ => throw new IllegalArgumentException("event entry without name")
          }
          def parseParam(in: JValue): AbiParam = {
            val pn = in \ "name" match { case JString(s) => s; case _ => "" }
            val pt = in \ "type" match { case JString(s) => s; case _ => "string" }
            val idx = in \ "indexed" match { case JBool(b) => b; case _ => false }
            val comps = in \ "components" match {
              case JArray(cs) => cs.map(parseParam)
              case _ => Nil
            }
            AbiParam(pn, pt, idx, comps)
          }
          val params = (e \ "inputs" match {
            case JArray(is) => is
            case _ => Nil
          }).map(parseParam)
          Some(AbiEvent(name, params))
        case _ => None
      }
    }
  }

  /** ABI type → Spark type, following the reference's `param_to_value`
    * JSON representation (event_processor.rs:215-238): integers wider
    * than 63 bits, addresses, and byte strings stay decimal/hex STRINGS
    * (uint256 has 78 decimal digits — wider than any SQL numeric);
    * narrow ints decode to LONG, bool to BOOLEAN, arrays recurse. */
  def sparkType(abiType: String): DataType = {
    val arr = "^(.*)\\[\\d*\\]$".r
    abiType match {
      case arr(elem) => ArrayType(sparkType(elem))
      case "address" | "string" => StringType
      case "bool" => BooleanType
      case t if t.startsWith("bytes") => StringType
      case t if t.startsWith("uint") =>
        val bits = if (t == "uint") 256 else t.drop(4).toInt
        if (bits < 64) LongType else StringType
      case t if t.startsWith("int") =>
        val bits = if (t == "int") 256 else t.drop(3).toInt
        if (bits <= 64) LongType else StringType
      case "tuple" => StringType // raw positional-array JSON text; decode()
                                 // surfaces typed per-component columns
      case other => throw new IllegalArgumentException(s"unsupported ABI type $other")
    }
  }

  /** The JSON *wire* type a param is parsed with, as opposed to the typed
    * surface `sparkType` exposes. The reference's `param_to_value`
    * (event_processor.rs:222) renders EVERY Uint/Int width — narrow ones
    * included — as a quoted decimal string; parsing a quoted number
    * through a LongType field would null the whole struct (Spark's JSON
    * parser rejects quoted numbers for LongType), so integer fields parse
    * as STRING and cast to their typed form afterwards. A string-typed
    * field also accepts a bare JSON number (Jackson hands back the raw
    * token text), so non-reference producers that emit `"k": 87` decode
    * identically. */
  def wireOf(t: DataType): DataType = t match {
    case ArrayType(e, n) => ArrayType(wireOf(e), n)
    case LongType => StringType
    case other => other
  }

  /** Per-event-type typed tables — the analog of the reference writing
    * each decoded log into the collection named after its event
    * (indexer_impl.rs:197). Each frame keeps the `keep` passthrough
    * columns and appends one typed column per ABI param; a tuple param
    * (rendered by the reference as a POSITIONAL JSON array,
    * `param_to_value`'s `Token::Tuple` arm) additionally surfaces one
    * typed `<param>_<component>` column per declared component —
    * positional `element_at` over the raw array text, cast to the
    * component's Spark type (nested tuples/arrays stay raw JSON text). */
  def decode(events: DataFrame, abi: Seq[AbiEvent],
      keep: Seq[String] = Seq("event_id"),
      typeCol: String = "event_type", propsCol: String = "props",
      targetEvents: Set[String] = Set.empty): Map[String, DataFrame] =
    abi.filter(e => targetEvents.isEmpty || targetEvents(e.name))
      .map { ev =>
        val cols = keep.map(col) ++ ev.params.flatMap { p =>
          val desired = sparkType(p.abiType)
          val f = col("__d").getField(p.name)
          // wire → typed: integer fields parsed as strings (the
          // reference quotes every int width) cast to LONG / array<long>
          val base = (if (wireOf(desired) == desired) f
                      else f.cast(desired)).as(p.name)
          if (p.abiType == "tuple" && p.components.nonEmpty) {
            val elems = from_json(col("__d").getField(p.name),
              ArrayType(StringType))
            base +: p.components.zipWithIndex.map { case (c, i) =>
              val raw = element_at(elems, i + 1)
              (sparkType(c.abiType) match {
                case ArrayType(_, _) | StringType => raw // nested: raw text
                case t => raw.cast(t)
              }).as(s"${p.name}_${c.name}")
            }
          } else Seq(base)
        }
        ev.name -> events
          .filter(col(typeCol) === ev.name)
          .withColumn("__d", from_json(col(propsCol), ev.wireSchema))
          .select(cols: _*)
      }.toMap

  /** Single-scan long-format decode: one row per (log, param) with the
    * value rendered to its reference JSON string form and the param's
    * indexed flag. ONE merged-schema `from_json` parses every row (the
    * only non-codegen expression in the plan — JsonToStructs is
    * CodegenFallback); the per-event dispatch is a `when`/`getField`/
    * `cast` projection that stays inside whole-stage codegen. Fields
    * declared with conflicting Spark types across events widen to
    * StringType in the merged schema (Jackson renders any token —
    * number, array, object — as its raw JSON text) and narrow back per
    * branch. Rows of types absent from the ABI are dropped (the
    * reference skips non-matching signatures). */
  def decodeLong(events: DataFrame, abi: Seq[AbiEvent],
      idCol: String = "event_id",
      typeCol: String = "event_type", propsCol: String = "props"): DataFrame = {
    require(abi.nonEmpty, "empty ABI")
    // merge at the WIRE layer (ints parse as strings — see wireOf): a
    // field whose wire types still conflict across events widens to raw
    // JSON text and narrows back per branch
    val mergedTypes: Map[String, DataType] = abi.flatMap(_.params)
      .groupBy(_.name).map { case (n, ps) =>
        val ts = ps.map(p => wireOf(sparkType(p.abiType))).distinct
        n -> (if (ts.size == 1) ts.head else StringType)
      }
    val merged = StructType(
      abi.flatMap(_.params.map(_.name)).distinct
        .map(n => StructField(n, mergedTypes(n))))
    val branches: Seq[Column] = abi.map { ev =>
      val params = ev.params.map { p =>
        val desired = sparkType(p.abiType)
        val f = col("__d").getField(p.name)
        val typed =
          if (mergedTypes(p.name) == desired) f
          else (mergedTypes(p.name), desired) match {
            // conflicted array field arrives as raw text: re-parse with
            // the wire element type (quoted ints), then cast typed
            case (StringType, a: ArrayType) => from_json(f, wireOf(a)).cast(a)
            case _ => f.cast(desired) // incl. array<string> → array<long>
          }
        struct(
          lit(p.name).as("param"),
          renderValue(typed, desired).as("value_str"),
          lit(if (p.indexed) 1L else 0L).as("indexed"))
      }
      when(col(typeCol) === ev.name, array(params: _*))
    }
    events
      // type-membership filter BEFORE the parse: equivalent to dropping
      // rows whose decode branch is null, but expressed on the raw column
      // so it pushes down to the parquet scan (PushedFilters: In) instead
      // of the optimizer inlining __params — and its from_json — into a
      // post-projection Filter (10 parses/row in the unpushed shape)
      .filter(col(typeCol).isin(abi.map(_.name): _*))
      .withColumn("__d", from_json(col(propsCol), merged))
      .withColumn("__params", coalesce(branches :+ lit(null): _*))
      // explode_outer, not explode: InferFiltersFromGenerate would infer
      // `size(__params)>0 AND isnotnull(__params)` from a plain explode
      // and push the whole decode expression into a pre-projection Filter
      // (re-parsing every row up to 2× per branch); the outer variant
      // infers nothing and the post-Generate null filter is a cheap
      // struct-ref check that cannot sink below the Generate
      .select(col(idCol), col(typeCol).as("decoded_type"),
        explode_outer(col("__params")).as("p"))
      .filter(col("p").isNotNull)
      .select(col(idCol), col("decoded_type"),
        col("p.param").as("param"), col("p.value_str").as("value_str"),
        col("p.indexed").as("indexed"))
  }

  /** Render a decoded value to the reference's JSON string form
    * (param_to_value): scalars via string cast, arrays as compact JSON.
    * Integer elements inside arrays render as QUOTED decimal strings —
    * `Token::Uint/Int` become `Value::String` at every width in the
    * reference — so the typed array<long> casts back to array<string>
    * before serializing. */
  private def renderValue(c: Column, t: DataType): Column = t match {
    case a: ArrayType if wireOf(a) != a => to_json(c.cast(wireOf(a)))
    case _: ArrayType => to_json(c)
    case _ => c.cast("string")
  }
}
