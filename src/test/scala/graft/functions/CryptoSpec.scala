package graft.functions

import graft.SparkSpec
import graft.functions.crypto.{Eip712, Keccak256, Secp256k1}

/** Crypto kernels validated against public vectors:
  * - Keccak-256 test vectors (keccak.team published digests)
  * - the address of private key 1 (a well-known public constant)
  * - the first Hardhat/Anvil dev account (public key pair), which is
  *   also the signer of the reference repo's own typed-data test vector
  *   (/root/reference/src/node/src/mutation_utils.rs:224-232) — that
  *   vector exercises the full EIP-712 digest + ecrecover path
  *   end-to-end against a signature we did not produce.
  */
class CryptoSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = Keccak256.hexLower(b)

  test("keccak256 public vectors") {
    assert(hex(Keccak256.hashUtf8("")) ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hex(Keccak256.hashUtf8("abc")) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(hex(Keccak256.hashUtf8("The quick brown fox jumps over the lazy dog")) ===
      "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15")
    // multi-block input (> 136-byte rate)
    assert(hex(Keccak256.hashUtf8("a" * 200)) === hex(Keccak256.hash(("a" * 200).getBytes)))
    assert(Keccak256.hash(("a" * 200).getBytes).length === 32)
  }

  test("secp256k1 address of private key 1 matches the public constant") {
    assert(Secp256k1.privToAddress(BigInt(1)) ===
      "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf")
  }

  private val hardhatKey = BigInt(
    "ac0974bec39a17e36ba4a6b4d238ff944bacb478cbed5efcae784d7bf4f2ff80", 16)
  private val hardhatAddr = "0xf39fd6e51aad88f6f4ce6ab8827279cfffb92266"

  test("hardhat dev account #0 derives its public address") {
    assert(Secp256k1.privToAddress(hardhatKey) === hardhatAddr)
  }

  test("EIP-712 spec 'Mail' example vector (published constants)") {
    // The canonical example from the EIP-712 specification (the Example.js
    // test vector published with the EIP): known domain separator, struct
    // hash, digest, and a signature by the key keccak256("cow") whose
    // address is 0xCD2a3d9F938E13CD947Ec05AbC7FE734Df8DD826.
    val typedData =
      """{"types":{"EIP712Domain":[{"name":"name","type":"string"},{"name":"version","type":"string"},{"name":"chainId","type":"uint256"},{"name":"verifyingContract","type":"address"}],"Person":[{"name":"name","type":"string"},{"name":"wallet","type":"address"}],"Mail":[{"name":"from","type":"Person"},{"name":"to","type":"Person"},{"name":"contents","type":"string"}]},"primaryType":"Mail","domain":{"name":"Ether Mail","version":"1","chainId":1,"verifyingContract":"0xCcCCccccCCCCcCCCCCCcCcCccCcCCCcCcccccccC"},"message":{"from":{"name":"Cow","wallet":"0xCD2a3d9F938E13CD947Ec05AbC7FE734Df8DD826"},"to":{"name":"Bob","wallet":"0xbBbBBBBbbBBBbbbBbbBbbbbBBbBbbbbBbBbbBBbB"},"contents":"Hello, Bob!"}}"""
    val z = Eip712.digest(typedData)
    assert(z.isDefined)
    assert(hex(z.get) ===
      "be609aee343fb3c4b28e1df9e632fca64fcfaede20f02e86244efddf30957bd2")
    val cowKey = BigInt(1, Keccak256.hashUtf8("cow"))
    val cowAddr = "0xcd2a3d9f938e13cd947ec05abc7fe734df8dd826"
    assert(Secp256k1.privToAddress(cowKey) === cowAddr)
    // the published signature for this digest
    val sig = "0x4355c47d63924e8a72e509b65029052eb6c299d53a04e167c5775fd466751c9d07299936d304c153f6443dfa05f40ff007d72911b6f72307f996231605b915621c"
    val rec = Eip712.recoverAddressOrNull(typedData, sig)
    assert(rec != null)
    assert(rec.toString === cowAddr)
  }

  test("reference typed-data vector recovers a stable address") {
    // The typed data + signature from the reference's own unit test
    // (/root/reference/src/node/src/mutation_utils.rs:226-232). That test
    // prints the recovered address without asserting it (its expected-
    // address line is commented out), so the ground truth here is only
    // "recovery succeeds and is deterministic" — the authoritative
    // digest check is the EIP-712 spec vector above.
    val typedData =
      """{"types":{"EIP712Domain":[],"Message":[{"name":"rollupInterval","type":"string"},{"name":"minRollupSize","type":"string"},{"name":"networkId","type":"string"},{"name":"chainId","type":"string"},{"name":"contractAddr","type":"string"},{"name":"rollupMaxInterval","type":"string"},{"name":"evmNodeUrl","type":"string"},{"name":"arNodeUrl","type":"string"},{"name":"minGcOffset","type":"string"}]},"domain":{},"primaryType":"Message","message":{"rollupInterval":"600000","rollupMaxInterval":"172800000","minRollupSize":"1048576","evmNodeUrl":"xxx","arNodeUrl":"xxx","chainId":"31337","networkId":"1","contractAddr":"0x5FbDB2315678afecb367f032d93F642f64180aa3","minGcOffset":"864000"}}"""
    val sig =
      "0xffe078c204181dca7166d0809576de3e7b43aa25448b48ab9b62efadb9873bc62935d1bcc4366e919616108e0b41ff46e44297994b81bdc9c73c87cbd069befc1b"
    val rec = Eip712.recoverAddressOrNull(typedData, sig)
    assert(rec != null)
    assert(rec.toString === Eip712.recoverAddressOrNull(typedData, sig).toString)
  }

  private def mutationTypedData(payloadHex: String, nonce: String): String =
    s"""{"types":{"EIP712Domain":[],"Message":[{"name":"payload","type":"bytes"},{"name":"nonce","type":"string"}]},"domain":{},"primaryType":"Message","message":{"payload":"0x$payloadHex","nonce":"$nonce"}}"""

  test("sign/recover roundtrip over the mutation request shape") {
    for (key <- 1L to 5L) {
      val td = mutationTypedData("deadbeef" + key.toString * 2, key.toString)
      val sig = Eip712.signOrNull(td, key)
      assert(sig != null)
      assert(sig.toString.length === 132) // 0x + 65 bytes
      val rec = Eip712.recoverAddressOrNull(td, sig.toString)
      assert(rec != null)
      assert(rec.toString === Secp256k1.privToAddress(BigInt(key)))
    }
  }

  test("tampered payload or nonce does not recover the signer") {
    val td = mutationTypedData("00112233", "7")
    val sig = Eip712.signOrNull(td, 3L).toString
    val tampered = Eip712.recoverAddressOrNull(mutationTypedData("00112234", "7"), sig)
    // recovery yields *some* address (or null), but never the signer's
    assert(tampered == null ||
      tampered.toString != Secp256k1.privToAddress(BigInt(3)))
    val tampered2 = Eip712.recoverAddressOrNull(mutationTypedData("00112233", "8"), sig)
    assert(tampered2 == null ||
      tampered2.toString != Secp256k1.privToAddress(BigInt(3)))
  }

  test("mutation_verify_sig: forged rows fail recovery, valid rows pass") {
    val df = graft.events.EventQueries.mutationVerifySig(spark, sf).cache()
    val rows = df.collect()
    assert(rows.length === 8) // one per planted sender
    var forgedTotal = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_mutations")
      val valid = r.getAs[Long]("n_valid")
      val forged = r.getAs[Long]("n_forged")
      // recovery accepts exactly the honestly-signed rows
      assert(valid === n - forged)
      forgedTotal += forged
    }
    assert(forgedTotal > 0) // the fixture really plants forgeries
    df.unpersist()
  }

  test("oracle SQL inlines exactly the planted addresses (no drift)") {
    val sql = graft.events.EventQueries.mutationVerifySigSql
    graft.events.VerifySigFixture.plantedAddresses.take(8).foreach { a =>
      assert(sql.contains(a))
    }
  }

  test("malformed inputs are null, not exceptions") {
    assert(Eip712.recoverAddressOrNull("not json", "0x00") == null)
    assert(Eip712.recoverAddressOrNull("{}", "0x" + "00" * 65) == null)
    val td = mutationTypedData("aa", "1")
    assert(Eip712.recoverAddressOrNull(td, "0xzz") == null)
    assert(Eip712.recoverAddressOrNull(td, "0x" + "00" * 65) == null) // r=0
    assert(Eip712.signOrNull("not json", 1L) == null)
    // field objects missing "name"/"type" previously escaped as NPE —
    // the contract is None/null for ANY crafted row
    val missingName =
      """{"types":{"EIP712Domain":[{"type":"string"}],
        |"M":[{"name":"x","type":"string"}]},
        |"primaryType":"M","domain":{},"message":{"x":"1"}}""".stripMargin
    assert(Eip712.digest(missingName).isEmpty)
    assert(Eip712.recoverAddressOrNull(missingName, "0x" + "11" * 65) == null)
    val missingType =
      """{"types":{"EIP712Domain":[],"M":[{"name":"x"}]},
        |"primaryType":"M","domain":{},"message":{"x":"1"}}""".stripMargin
    assert(Eip712.digest(missingType).isEmpty)
    // non-object types node
    assert(Eip712.digest("""{"types":3,"primaryType":"M","domain":{},"message":{}}""").isEmpty)
  }

  test("crypto expressions reject mistyped inputs at analysis time") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expression}
    import graft.functions.crypto.{Eip712Sign, RecoverSigner}
    val df = spark.range(1).select(lit(42).as("i"), lit("x").as("s"))
    // IntegerType where StringType is declared → analysis failure, not a
    // codegen/interpreted divergence at runtime
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(column(
        RecoverSigner(expression(col("i")), expression(col("s"))))).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("type"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(column(
        Eip712Sign(expression(col("s")), expression(col("s"))))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("type"))
  }
}
