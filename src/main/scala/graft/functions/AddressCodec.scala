package graft.functions

import java.security.MessageDigest

/** Bitcoin address encodings — Base58Check (P2PKH/P2SH), bech32/bech32m
  * (BIP-173/BIP-350 segwit), and the RIPEMD-160 digest they need. All three
  * are from-scratch implementations of the published public specifications;
  * the reference gets the identical behavior from bitcoinj's
  * `getToAddress(np, true)` (BlockchainToGraph.java:1067–1074).
  *
  * Everything here is allocation-lean and thread-safe (no shared mutable
  * state) because [[ScriptToAddress.decode]] calls it once per tx output from
  * inside whole-stage-generated code.
  */
object AddressCodec {

  /** Network parameters: Base58 version bytes + bech32 HRP. */
  final case class Network(p2pkhVersion: Byte, p2shVersion: Byte, hrp: String)
  val Mainnet: Network = Network(0x00, 0x05, "bc")
  val Testnet: Network = Network(0x6f, 0xc4.toByte, "tb")
  val Regtest: Network = Network(0x6f, 0xc4.toByte, "bcrt")

  // ------------------------------------------------------------- RIPEMD-160
  /** RIPEMD-160 (Dobbertin/Bosselaers/Preneel, 1996) — not shipped by the
    * JDK's MessageDigest providers, so implemented directly from the spec.
    */
  object Ripemd160 {
    private val RL = Array(
      0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
      7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
      3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
      1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
      4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
    private val RR = Array(
      5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
      6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
      15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
      8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
      12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
    private val SL = Array(
      11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
      7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
      11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
      11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
      9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
    private val SR = Array(
      8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
      9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
      9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
      15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
      8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
    private val KL = Array(0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC.toInt, 0xA953FD4E.toInt)
    private val KR = Array(0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000)

    private def f(round: Int, x: Int, y: Int, z: Int): Int = round match {
      case 0 => x ^ y ^ z
      case 1 => (x & y) | (~x & z)
      case 2 => (x | ~y) ^ z
      case 3 => (x & z) | (y & ~z)
      case _ => x ^ (y | ~z)
    }

    def digest(msg: Array[Byte]): Array[Byte] = {
      // MD-strengthening pad: 0x80, zeros, 64-bit little-endian bit length.
      val bitLen = msg.length.toLong * 8
      val padded = new Array[Byte](((msg.length + 8) / 64 + 1) * 64)
      System.arraycopy(msg, 0, padded, 0, msg.length)
      padded(msg.length) = 0x80.toByte
      var i = 0
      while (i < 8) {
        padded(padded.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xFF).toByte
        i += 1
      }
      var h0 = 0x67452301; var h1 = 0xEFCDAB89; var h2 = 0x98BADCFE
      var h3 = 0x10325476; var h4 = 0xC3D2E1F0
      val x = new Array[Int](16)
      var block = 0
      while (block < padded.length) {
        var w = 0
        while (w < 16) {
          val o = block + w * 4
          x(w) = (padded(o) & 0xFF) | ((padded(o + 1) & 0xFF) << 8) |
            ((padded(o + 2) & 0xFF) << 16) | ((padded(o + 3) & 0xFF) << 24)
          w += 1
        }
        var al = h0; var bl = h1; var cl = h2; var dl = h3; var el = h4
        var ar = h0; var br = h1; var cr = h2; var dr = h3; var er = h4
        var j = 0
        while (j < 80) {
          val round = j / 16
          var t = Integer.rotateLeft(
            al + f(round, bl, cl, dl) + x(RL(j)) + KL(round), SL(j)) + el
          al = el; el = dl; dl = Integer.rotateLeft(cl, 10); cl = bl; bl = t
          t = Integer.rotateLeft(
            ar + f(4 - round, br, cr, dr) + x(RR(j)) + KR(round), SR(j)) + er
          ar = er; er = dr; dr = Integer.rotateLeft(cr, 10); cr = br; br = t
          j += 1
        }
        val t = h1 + cl + dr
        h1 = h2 + dl + er; h2 = h3 + el + ar; h3 = h4 + al + br
        h4 = h0 + bl + cr; h0 = t
        block += 64
      }
      val out = new Array[Byte](20)
      val hs = Array(h0, h1, h2, h3, h4)
      i = 0
      while (i < 5) {
        out(i * 4) = (hs(i) & 0xFF).toByte
        out(i * 4 + 1) = ((hs(i) >>> 8) & 0xFF).toByte
        out(i * 4 + 2) = ((hs(i) >>> 16) & 0xFF).toByte
        out(i * 4 + 3) = ((hs(i) >>> 24) & 0xFF).toByte
        i += 1
      }
      out
    }
  }

  /** Per-thread SHA-256: `getInstance` is a JCA lookup + allocation per
    * call and this codec runs once per decoded output script at corpus
    * scale. `digest()` auto-resets, so reuse is safe.
    */
  private val sha256 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  /** hash160 = RIPEMD160(SHA256(x)) — the pubkey→address hash. */
  def hash160(bytes: Array[Byte]): Array[Byte] =
    Ripemd160.digest(sha256.get().digest(bytes))

  // ------------------------------------------------------------ Base58Check
  object Base58 {
    private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

    /** Plain base58 of a big-endian byte string (leading zero bytes → '1'). */
    def encode(input: Array[Byte]): String = {
      var zeros = 0
      while (zeros < input.length && input(zeros) == 0) zeros += 1
      // repeated divmod-58 over a working copy; size bound 138% of input
      val work = java.util.Arrays.copyOf(input, input.length)
      val encoded = new Array[Char](input.length * 2)
      var outStart = encoded.length
      var inStart = zeros
      while (inStart < work.length) {
        // one divmod pass: work = work / 58, returns remainder
        var rem = 0
        var i = inStart
        while (i < work.length) {
          val digit = (work(i) & 0xFF) + rem * 256
          work(i) = (digit / 58).toByte
          rem = digit % 58
          i += 1
        }
        outStart -= 1
        encoded(outStart) = Alphabet(rem)
        if (work(inStart) == 0) inStart += 1
      }
      val sb = new java.lang.StringBuilder(zeros + (encoded.length - outStart))
      var z = 0
      while (z < zeros) { sb.append('1'); z += 1 }
      sb.append(encoded, outStart, encoded.length - outStart)
      sb.toString
    }

    /** Base58Check: version ++ payload ++ first 4 bytes of sha256d. */
    def encodeCheck(version: Byte, payload: Array[Byte]): String = {
      val data = new Array[Byte](1 + payload.length + 4)
      data(0) = version
      System.arraycopy(payload, 0, data, 1, payload.length)
      val md = sha256.get()
      md.update(data, 0, 1 + payload.length)
      val check = md.digest(md.digest())
      System.arraycopy(check, 0, data, 1 + payload.length, 4)
      encode(data)
    }
  }

  // --------------------------------------------------------- bech32/bech32m
  object Bech32 {
    private val Charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
    private val Gen = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)
    private val Bech32mConst = 0x2bc830a3

    private def polymod(values: Array[Int]): Int = {
      var chk = 1
      var i = 0
      while (i < values.length) {
        val top = chk >>> 25
        chk = ((chk & 0x1ffffff) << 5) ^ values(i)
        var g = 0
        while (g < 5) {
          if (((top >>> g) & 1) != 0) chk ^= Gen(g)
          g += 1
        }
        i += 1
      }
      chk
    }

    /** 8-bit groups → 5-bit groups, zero-padded (BIP-173 convertbits). */
    private def to5bit(program: Array[Byte]): Array[Int] = {
      val out = new Array[Int]((program.length * 8 + 4) / 5)
      var acc = 0; var bits = 0; var n = 0
      var i = 0
      while (i < program.length) {
        acc = (acc << 8) | (program(i) & 0xFF)
        bits += 8
        while (bits >= 5) {
          bits -= 5
          out(n) = (acc >>> bits) & 31
          n += 1
        }
        i += 1
      }
      if (bits > 0) { out(n) = (acc << (5 - bits)) & 31 }
      out
    }

    /** Segwit address: bech32 for witness v0, bech32m (BIP-350) for v1+. */
    def segwitAddress(hrp: String, witVer: Int, program: Array[Byte]): String = {
      val data = witVer +: to5bit(program)
      val hrpExpanded =
        hrp.map(_.toInt >>> 5).toArray ++ Array(0) ++ hrp.map(_.toInt & 31).toArray
      val const = if (witVer == 0) 1 else Bech32mConst
      val pm = polymod(hrpExpanded ++ data ++ Array(0, 0, 0, 0, 0, 0)) ^ const
      val checksum = (0 until 6).map(i => (pm >>> (5 * (5 - i))) & 31)
      val sb = new java.lang.StringBuilder(hrp.length + 1 + data.length + 6)
      sb.append(hrp).append('1')
      data.foreach(d => sb.append(Charset(d)))
      checksum.foreach(c => sb.append(Charset(c)))
      sb.toString
    }
  }
}
