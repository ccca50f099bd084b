package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-event ABI decode against a WETH-style ABI (the fixture the
  * reference's own test pins — event_processor.rs:244): four events,
  * indexed address params, a uint256 wider than any SQL numeric. */
class AbiDecodeSpec extends SparkSpec {

  // WETH9's event surface: Transfer/Approval carry two indexed addresses
  // + uint256 wad; Deposit/Withdrawal one indexed address + wad.
  private val wethAbi =
    """[
      |{"constant":true,"inputs":[],"name":"totalSupply",
      | "outputs":[{"name":"","type":"uint256"}],"type":"function"},
      |{"anonymous":false,"type":"event","name":"Transfer","inputs":[
      |  {"indexed":true,"name":"src","type":"address"},
      |  {"indexed":true,"name":"dst","type":"address"},
      |  {"indexed":false,"name":"wad","type":"uint256"}]},
      |{"anonymous":false,"type":"event","name":"Approval","inputs":[
      |  {"indexed":true,"name":"src","type":"address"},
      |  {"indexed":true,"name":"guy","type":"address"},
      |  {"indexed":false,"name":"wad","type":"uint256"}]},
      |{"anonymous":false,"type":"event","name":"Deposit","inputs":[
      |  {"indexed":true,"name":"dst","type":"address"},
      |  {"indexed":false,"name":"wad","type":"uint256"}]},
      |{"anonymous":false,"type":"event","name":"Withdrawal","inputs":[
      |  {"indexed":true,"name":"src","type":"address"},
      |  {"indexed":false,"name":"wad","type":"uint256"}]},
      |{"anonymous":true,"type":"event","name":"Ghost","inputs":[]}
      |]""".stripMargin

  // a uint256 beyond Long and Decimal(38) range — must survive as string
  private val bigWad = "115792089237316195423570985008687907853269984665640564039457"

  private def logs = {
    import spark.implicits._
    Seq(
      (0L, "Transfer",
        s"""{"src":"0x1111111111111111111111111111111111111111","dst":"0x2222222222222222222222222222222222222222","wad":"$bigWad"}"""),
      (1L, "Deposit",
        """{"dst":"0x3333333333333333333333333333333333333333","wad":"42"}"""),
      (2L, "Withdrawal",
        """{"src":"0x1111111111111111111111111111111111111111","wad":"7"}"""),
      (3L, "Unknown", """{"x":1}"""))
      .toDF("event_id", "event_type", "props")
  }

  test("parseAbi keeps declared non-anonymous events only, with indexed flags") {
    val abi = AbiDecode.parseAbi(wethAbi)
    assert(abi.map(_.name) === Seq("Transfer", "Approval", "Deposit", "Withdrawal"))
    val transfer = abi.find(_.name == "Transfer").get
    assert(transfer.params.map(p => (p.name, p.abiType, p.indexed)) ===
      Seq(("src", "address", true), ("dst", "address", true), ("wad", "uint256", false)))
  }

  test("type mapping: narrow ints long, uint256/address/bytes string, bool bool, arrays recurse") {
    assert(AbiDecode.sparkType("uint32") === LongType)
    assert(AbiDecode.sparkType("int64") === LongType)
    assert(AbiDecode.sparkType("uint64") === StringType) // doesn't fit signed long
    assert(AbiDecode.sparkType("uint256") === StringType)
    assert(AbiDecode.sparkType("address") === StringType)
    assert(AbiDecode.sparkType("bytes32") === StringType)
    assert(AbiDecode.sparkType("bool") === BooleanType)
    assert(AbiDecode.sparkType("uint256[]") === ArrayType(StringType))
    assert(AbiDecode.sparkType("address[3]") === ArrayType(StringType))
  }

  test("decode emits one typed table per event type") {
    val abi = AbiDecode.parseAbi(wethAbi)
    val tables = AbiDecode.decode(logs, abi)
    assert(tables.keySet === Set("Transfer", "Approval", "Deposit", "Withdrawal"))

    val t = tables("Transfer")
    assert(t.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq(("event_id", LongType), ("src", StringType), ("dst", StringType),
        ("wad", StringType)))
    val row = t.collect().head
    assert(row.getAs[String]("src") === "0x" + "11" * 20)
    assert(row.getAs[String]("wad") === bigWad) // full width preserved
    assert(tables("Approval").count() === 0)
    assert(tables("Deposit").count() === 1)
    // unknown event types are nobody's table (reference skips unmatched
    // signatures)
    assert(tables.values.map(_.count()).sum === 3)
  }

  test("decodeLong: one row per (log, param), indexed flags, unknown types dropped") {
    val abi = AbiDecode.parseAbi(wethAbi)
    val out = AbiDecode.decodeLong(logs, abi).collect()
    assert(out.length === 3 + 2 + 2) // Transfer 3 params, Deposit 2, Withdrawal 2
    val transferRows = out.filter(_.getAs[String]("decoded_type") == "Transfer")
    assert(transferRows.map(r =>
      (r.getAs[String]("param"), r.getAs[Long]("indexed"))).toSet ===
      Set(("src", 1L), ("dst", 1L), ("wad", 0L)))
    assert(transferRows.find(_.getAs[String]("param") == "wad").get
      .getAs[String]("value_str") === bigWad)
    assert(!out.exists(_.getAs[String]("decoded_type") == "Unknown"))
  }

  test("testdata ABI decode renders numeric JSON to strings consistently") {
    // the driver-checked query's core assumption: a JSON *number* read
    // through LONG and STRING schemas renders to the same decimal string
    import spark.implicits._
    val df = Seq((0L, "signup", """{"k": 87}"""), (1L, "view", """{"k": 87}"""),
      (2L, "purchase", """{"k": 87}"""))
      .toDF("event_id", "event_type", "props")
    val abi = AbiDecode.parseAbi(EventQueries.testdataAbi)
    val out = AbiDecode.decodeLong(df, abi).collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[String]("value_str")).toSet === Set("87"))
    assert(out.find(_.getAs[String]("decoded_type") == "signup").get
      .getAs[Long]("indexed") === 1L)
  }

  test("reference wire form: QUOTED narrow ints decode (param_to_value quotes every int width)") {
    // the reference renders uint8/uint32/int64… as quoted decimal strings
    // (event_processor.rs:222 Token::Uint/Int → Value::String); a
    // LongType parse schema would null the whole struct on such input —
    // the wire schema parses strings and casts, so both forms decode
    import spark.implicits._
    val df = Seq(
      (0L, "signup", """{"k":"87"}"""),   // reference wire form (quoted)
      (1L, "signup", """{"k":87}"""),     // bare-number producer
      (2L, "error", """{"k":"-3"}"""))    // quoted negative int64
      .toDF("event_id", "event_type", "props")
    val abi = AbiDecode.parseAbi(EventQueries.testdataAbi)
    val long = AbiDecode.decodeLong(df, abi).collect()
    assert(long.length === 3)
    assert(long.map(r => r.getAs[Long]("event_id") -> r.getAs[String]("value_str")).toMap ===
      Map(0L -> "87", 1L -> "87", 2L -> "-3"))
    val typed = AbiDecode.decode(df, abi, targetEvents = Set("signup"))("signup")
    assert(typed.schema("k").dataType === LongType) // typed surface stays LONG
    assert(typed.orderBy($"event_id").collect().map(_.getAs[Long]("k")).toSeq ===
      Seq(87L, 87L))
    // arrays of narrow ints: quoted elements parse, typed array<long>,
    // value_str re-renders to the reference's quoted element form
    val arrAbi = AbiDecode.parseAbi(
      """[{"type":"event","name":"Batch","inputs":[
        |  {"name":"ids","type":"uint8[]","indexed":false}]}]""".stripMargin)
    val adf = Seq((0L, "Batch", """{"ids":["1","2",3]}"""))
      .toDF("event_id", "event_type", "props")
    val at = AbiDecode.decode(adf, arrAbi)("Batch")
    assert(at.schema("ids").dataType === ArrayType(LongType))
    assert(at.head().getAs[Seq[Long]]("ids") === Seq(1L, 2L, 3L))
    assert(AbiDecode.decodeLong(adf, arrAbi).head()
      .getAs[String]("value_str") === """["1","2","3"]""")
  }

  test("tuple params: components parse, typed per-component columns surface") {
    // the reference renders Token::Tuple as a POSITIONAL JSON array
    // (event_processor.rs param_to_value); wide ints inside it are
    // decimal strings
    import spark.implicits._
    val abiJson =
      """[{"type":"event","name":"Swap","inputs":[
        |  {"name":"pool","type":"address","indexed":true},
        |  {"name":"amounts","type":"tuple","components":[
        |    {"name":"in0","type":"uint32"},
        |    {"name":"out1","type":"uint256"},
        |    {"name":"stable","type":"bool"}]}]}]""".stripMargin
    val abi = AbiDecode.parseAbi(abiJson)
    assert(abi.head.params(1).components.map(_.name) ===
      Seq("in0", "out1", "stable"))
    val big = "98765432109876543210987654321098765432109876543210"
    val df = Seq(
      (0L, "Swap", s"""{"pool":"0xabc","amounts":[7,"$big",true]}"""),
      (1L, "Swap", s"""{"pool":"0xdef","amounts":[0,"1",false]}"""))
      .toDF("event_id", "event_type", "props")
    val t = AbiDecode.decode(df, abi)("Swap")
    assert(t.columns.toSeq === Seq("event_id", "pool", "amounts",
      "amounts_in0", "amounts_out1", "amounts_stable"))
    val r0 = t.filter($"event_id" === 0L).head()
    assert(r0.getAs[String]("pool") === "0xabc")
    assert(r0.getAs[Long]("amounts_in0") === 7L)      // narrow int → LONG
    assert(r0.getAs[String]("amounts_out1") === big)  // uint256 → decimal string
    assert(r0.getAs[Boolean]("amounts_stable") === true)
    val r1 = t.filter($"event_id" === 1L).head()
    assert(r1.getAs[Long]("amounts_in0") === 0L &&
      !r1.getAs[Boolean]("amounts_stable"))
    // the raw positional-array text is preserved alongside
    assert(r0.getAs[String]("amounts").startsWith("["))
  }
}
