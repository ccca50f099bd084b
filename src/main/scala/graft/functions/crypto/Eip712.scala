package graft.functions.crypto

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets

/** EIP-712 typed-structured-data hashing and signed-payload recovery,
  * implemented from the public EIP-712 specification. This is the exact
  * verify pipeline of the reference node's write path
  * (/root/reference/src/node/src/mutation_utils.rs:75-127
  * `verify_setup`/`unwrap_and_light_verify`): the request payload is a
  * TypedData JSON (`{"types":{"EIP712Domain":[],"Message":[...]},
  * "domain":{},"primaryType":"Message","message":{...}}`, built by the
  * SDK at /root/reference/sdk/src/provider/storage_provider_v2.ts
  * `wrapTypedRequest`), the signature is 65-byte r‖s‖v hex, and the
  * sender is whoever the signature recovers to over the EIP-712 digest.
  *
  * Supported field types: nested structs, `T[]` arrays, string, bytes,
  * bytesN, address, bool, uintN/intN (decimal, 0x-hex, or numeric JSON)
  * — a superset of what the reference SDK emits (bytes/string/address).
  */
object Eip712 {

  // ObjectMapper is thread-safe for reads; shared per JVM.
  private val mapper = new ObjectMapper()

  private final class Malformed extends RuntimeException

  private def fail(): Nothing = throw new Malformed

  /** encodeType per EIP-712: primary type first, then referenced struct
    * types sorted alphabetically, each as `Name(type name,…)`. */
  private def encodeType(types: JsonNode, primary: String): String = {
    def fieldsOf(name: String): JsonNode = {
      val f = types.get(name)
      if (f == null || !f.isArray) fail()
      f
    }
    def refsOf(name: String, acc: scala.collection.mutable.Set[String]): Unit = {
      val it = fieldsOf(name).elements()
      while (it.hasNext) {
        val f = it.next()
        val t0 = f.get("type"); if (t0 == null) fail()
        val base = t0.asText.stripSuffix("[]")
        if (types.has(base) && base != name && !acc.contains(base)) {
          acc += base
          refsOf(base, acc)
        }
      }
    }
    def render(name: String): String = {
      val sb = new StringBuilder(name).append('(')
      val it = fieldsOf(name).elements()
      var first = true
      while (it.hasNext) {
        val f = it.next()
        if (!first) sb.append(',')
        first = false
        sb.append(f.get("type").asText).append(' ').append(f.get("name").asText)
      }
      sb.append(')').toString
    }
    val refs = scala.collection.mutable.Set.empty[String]
    refsOf(primary, refs)
    refs -= primary
    render(primary) + refs.toSeq.sorted.map(render).mkString
  }

  private def encodeBigInt(v: BigInt): Array[Byte] = {
    // 32-byte big-endian two's complement (covers intN negatives too)
    val raw = v.toByteArray
    val out = new Array[Byte](32)
    if (v.signum < 0) java.util.Arrays.fill(out, 0xff.toByte)
    val n = math.min(raw.length, 32)
    System.arraycopy(raw, raw.length - n, out, 32 - n, n)
    out
  }

  /** One 32-byte word per EIP-712 encodeData for a single field. */
  private def encodeValue(types: JsonNode, typ: String, v: JsonNode): Array[Byte] = {
    if (v == null) fail()
    if (typ.endsWith("[]")) {
      val inner = typ.stripSuffix("[]")
      if (!v.isArray) fail()
      val buf = new java.io.ByteArrayOutputStream(v.size * 32)
      val it = v.elements()
      while (it.hasNext) buf.write(encodeValue(types, inner, it.next()))
      Keccak256.hash(buf.toByteArray)
    } else if (types.has(typ)) {
      hashStruct(types, typ, v)
    } else if (typ == "string") {
      Keccak256.hash(v.asText.getBytes(StandardCharsets.UTF_8))
    } else if (typ == "bytes") {
      Keccak256.hash(Keccak256.fromHex(v.asText).getOrElse(fail()))
    } else if (typ == "address") {
      val b = Keccak256.fromHex(v.asText).getOrElse(fail())
      if (b.length != 20) fail()
      val out = new Array[Byte](32)
      System.arraycopy(b, 0, out, 12, 20)
      out
    } else if (typ == "bool") {
      val out = new Array[Byte](32)
      if (v.asBoolean(false) || v.asText == "true") out(31) = 1
      out
    } else if (typ.startsWith("bytes")) {
      val n = typ.substring(5).toIntOption.getOrElse(fail())
      if (n < 1 || n > 32) fail()
      val b = Keccak256.fromHex(v.asText).getOrElse(fail())
      if (b.length != n) fail()
      val out = new Array[Byte](32) // fixed bytes are right-padded
      System.arraycopy(b, 0, out, 0, n)
      out
    } else if (typ.startsWith("uint") || typ.startsWith("int")) {
      val s = v.asText
      val x =
        if (v.isNumber) BigInt(v.bigIntegerValue())
        else if (s.startsWith("0x") || s.startsWith("0X"))
          BigInt(1, Keccak256.fromHex(s).getOrElse(fail()))
        else scala.util.Try(BigInt(s)).getOrElse(fail())
      encodeBigInt(x)
    } else fail()
  }

  private def hashStruct(types: JsonNode, name: String, data: JsonNode): Array[Byte] = {
    val typeHash = Keccak256.hash(
      encodeType(types, name).getBytes(StandardCharsets.UTF_8))
    val fields = types.get(name)
    if (fields == null || !fields.isArray) fail()
    val buf = new java.io.ByteArrayOutputStream(32 * (fields.size + 1))
    buf.write(typeHash)
    val it = fields.elements()
    while (it.hasNext) {
      val f = it.next()
      buf.write(encodeValue(types, f.get("type").asText, data.get(f.get("name").asText)))
    }
    Keccak256.hash(buf.toByteArray)
  }

  /** EIP-712 digest of a TypedData JSON document:
    * keccak256(0x19 ‖ 0x01 ‖ domainSeparator ‖ hashStruct(message)). */
  def digest(typedDataJson: String): Option[Array[Byte]] =
    try {
      val root = mapper.readTree(typedDataJson)
      val types = root.get("types")
      val primary = root.get("primaryType")
      val domain = root.get("domain")
      val message = root.get("message")
      if (types == null || primary == null || domain == null || message == null) return None
      val ds = hashStruct(types, "EIP712Domain", domain)
      val hs = hashStruct(types, primary.asText, message)
      val buf = new Array[Byte](2 + 32 + 32)
      buf(0) = 0x19; buf(1) = 0x01
      System.arraycopy(ds, 0, buf, 2, 32)
      System.arraycopy(hs, 0, buf, 34, 32)
      Some(Keccak256.hash(buf))
    } catch {
      // NonFatal, not just Malformed/IOException: untrusted typed-data
      // docs can NPE deep in traversal (e.g. a field object missing
      // "name"/"type"), and the contract is "None, never an exception" —
      // one crafted row must not kill a whole job.
      case scala.util.control.NonFatal(_) => None
    }

  /** Parse a 65-byte r‖s‖v hex signature (v ∈ {0,1,27,28}). */
  def parseSignature(sig: String): Option[(BigInt, BigInt, Int)] =
    Keccak256.fromHex(sig).flatMap { b =>
      if (b.length != 65) None
      else {
        val r = BigInt(1, java.util.Arrays.copyOfRange(b, 0, 32))
        val s = BigInt(1, java.util.Arrays.copyOfRange(b, 32, 64))
        val v0 = b(64) & 0xff
        val recId = if (v0 >= 27) v0 - 27 else v0
        if (recId != 0 && recId != 1) None else Some((r, s, recId))
      }
    }

  /** The reference's sender recovery (`recover_typed_data` + address):
    * lowercase 0x address, or null for any malformed/unverifiable input.
    * Null (not an exception) so the Spark expression stays total. */
  def recoverAddressOrNull(typedDataJson: String, sig: String): UTF8String = {
    val out = for {
      z <- digest(typedDataJson)
      (r, s, recId) <- parseSignature(sig)
      addr <- Secp256k1.recoverAddress(BigInt(1, z), r, s, recId)
    } yield addr
    out.map(UTF8String.fromString).orNull
  }

  /** Fixture signer: sign a TypedData JSON with private scalar `key`,
    * returning 0x-prefixed r‖s‖v hex (v ∈ {27,28}), or null on
    * malformed typed data. Deterministic (derived k). */
  def signOrNull(typedDataJson: String, key: Long): UTF8String =
    digest(typedDataJson) match {
      case Some(z) if key > 0 =>
        val (r, s, recId) = Secp256k1.sign(BigInt(1, z), BigInt(key))
        val buf = new Array[Byte](65)
        System.arraycopy(Secp256k1.toBytes32(r), 0, buf, 0, 32)
        System.arraycopy(Secp256k1.toBytes32(s), 0, buf, 32, 32)
        buf(64) = (27 + recId).toByte
        UTF8String.fromString("0x" + Keccak256.hexLower(buf))
      case _ => null
    }
}
