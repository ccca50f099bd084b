package graft.functions.crypto

/** Keccak-256 — the original Keccak padding (0x01…0x80), as used by
  * Ethereum for addresses and EIP-712 digests. Implemented from the
  * public Keccak specification (keccak.team; the permutation is the
  * same Keccak-f[1600] standardized in FIPS 202). Pure JVM, no deps.
  *
  * Reference behavior being re-expressed: the signed-mutation verify
  * path of the reference node (/root/reference/src/node/src/
  * mutation_utils.rs:75-127) hashes EIP-712 typed data before
  * recovering the sender; this is the hash half of that pipeline.
  */
object Keccak256 {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  /** Rho rotation offsets; lane (x, y) lives at index x + 5*y. */
  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private val Rate = 136 // 1088-bit rate for 256-bit output

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi: lane (x,y) → rotated, placed at (y, 2x+3y)
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^
            (~b(((x + 1) % 5) + 5 * y) & b(((x + 2) % 5) + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  private def absorbBlock(st: Array[Long], data: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < Rate / 8) {
      var lane = 0L
      var j = 0
      while (j < 8) { lane |= (data(off + i * 8 + j) & 0xffL) << (8 * j); j += 1 }
      st(i) ^= lane
      i += 1
    }
  }

  /** 32-byte Keccak-256 digest of `input`. */
  def hash(input: Array[Byte]): Array[Byte] = {
    val st = new Array[Long](25)
    var off = 0
    while (input.length - off >= Rate) {
      absorbBlock(st, input, off)
      keccakF(st)
      off += Rate
    }
    val last = new Array[Byte](Rate)
    System.arraycopy(input, off, last, 0, input.length - off)
    last(input.length - off) = 0x01
    last(Rate - 1) = (last(Rate - 1) | 0x80).toByte
    absorbBlock(st, last, 0)
    keccakF(st)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      val lane = st(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((lane >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  def hashUtf8(s: String): Array[Byte] =
    hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hexLower(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Decode hex (with or without 0x prefix); None on malformed input. */
  def fromHex(s0: String): Option[Array[Byte]] = {
    val s = if (s0.startsWith("0x") || s0.startsWith("0X")) s0.substring(2) else s0
    if (s.length % 2 != 0) return None
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) return None
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    Some(out)
  }
}
