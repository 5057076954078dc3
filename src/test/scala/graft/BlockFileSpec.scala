package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.chain.{BestChain, GoldStats, Enrich}
import graft.operators.Multimodal
import graft.sources.BlockFileSource

/** Byte-level serializer (test-side, independent of the parser's reader) +
  * end-to-end blk-file → bronze → gold pipeline checks.
  */
class BlockFileSpec extends SparkSpec {

  // ---- test-side wire-format writer -------------------------------------
  private class W {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): W = { out.write(v & 0xFF); this }
    def u32(v: Long): W = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt)
      out.write(b.array()); this
    }
    def i64(v: Long): W = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      out.write(b.array()); this
    }
    def varInt(v: Long): W =
      if (v < 0xfd) u8(v.toInt)
      else if (v <= 0xFFFF) { u8(0xfd); u8(v.toInt); u8((v >> 8).toInt) }
      else { u8(0xfe); u32(v) }
    def bytes(b: Array[Byte]): W = { out.write(b); this }
    def result: Array[Byte] = out.toByteArray
  }

  private def sha256d(b: Array[Byte]): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(md.digest(b)) match { case h => h }
  }
  private def revHex(h: Array[Byte]): String =
    h.reverse.map(b => f"${b & 0xFF}%02x").mkString
  private def hexLe(hex: String): Array[Byte] = // display hex -> LE bytes
    hex.grouped(2).toArray.map(s => Integer.parseInt(s, 16).toByte).reverse

  private def p2pkh(payload: Byte): Array[Byte] =
    Array[Byte](0x76.toByte, 0xa9.toByte, 0x14.toByte) ++
      Array.fill(20)(payload) ++ Array[Byte](0x88.toByte, 0xac.toByte)

  /** Serialize a tx; returns (bytes, txid). */
  private def tx(
      inputs: Seq[(String, Int)], outputs: Seq[(Long, Array[Byte])],
      witness: Boolean = false): (Array[Byte], String) = {
    def body(withWitness: Boolean): Array[Byte] = {
      val w = new W
      w.u32(2) // version
      if (withWitness) { w.u8(0x00); w.u8(0x01) }
      w.varInt(inputs.size)
      inputs.foreach { case (prevHex, vout) =>
        w.bytes(hexLe(prevHex)); w.u32(vout.toLong & 0xFFFFFFFFL)
        w.varInt(2); w.u8(0x51); w.u8(0x51) // scriptSig: OP_1 OP_1
        w.u32(0xFFFFFFFFL)
      }
      w.varInt(outputs.size)
      outputs.foreach { case (v, script) => w.i64(v); w.varInt(script.length); w.bytes(script) }
      if (withWitness) inputs.foreach { _ => w.varInt(1); w.varInt(2); w.u8(0xaa); w.u8(0xbb) }
      w.u32(0) // locktime
      w.result
    }
    (body(witness), revHex(sha256d(body(false))))
  }

  private val coinbasePrev = "0" * 64

  /** Serialize a block; returns (framed record bytes, block hash). */
  private def block(prevHashHex: String, time: Long, txs: Seq[Array[Byte]],
      magic: Int = BlockFileSource.Magic): (Array[Byte], String) = {
    val hdr = new W
    hdr.u32(2).bytes(hexLe(prevHashHex)).bytes(new Array[Byte](32)).u32(time).u32(0x1d00ffffL).u32(42)
    val header = hdr.result
    val blk = new W
    blk.bytes(header).varInt(txs.size)
    txs.foreach(blk.bytes)
    val body = blk.result
    val rec = new W
    // file order = the 4 magic bytes big-endian-most-significant first
    rec.u32(Integer.reverseBytes(magic).toLong & 0xFFFFFFFFL).u32(body.length).bytes(body)
    (rec.result, revHex(sha256d(header)))
  }

  test("blk parser: framing, varints, txids, segwit witness exclusion, coinbase detection") {
    val (cb0bytes, cb0id) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(1))))
    val (b0bytes, b0hash) = block("0" * 64, 1000, Seq(cb0bytes))

    val (cb1bytes, cb1id) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(2))))
    val (tx1bytes, tx1id) = tx(Seq((cb0id, 0)),
      Seq((3000000000L, p2pkh(3)), (1900000000L, p2pkh(1))), witness = true)
    val (b1bytes, b1hash) = block(b0hash, 1600, Seq(cb1bytes, tx1bytes))

    val dir = Files.createTempDirectory("graft-blk")
    Files.write(Paths.get(dir.toString, "blk00000.dat"), b0bytes ++ b1bytes ++ new Array[Byte](16))

    val parsed = BlockFileSource.read(spark, dir.toString).collect()
      .map(b => b.hash -> b).toMap
    assert(parsed.keySet == Set(b0hash, b1hash))
    assert(parsed(b1hash).parent_hash == b0hash)
    assert(parsed(b1hash).ts == 1600)
    val txs1 = parsed(b1hash).txs.map(t => t.tx_hash -> t).toMap
    assert(txs1.keySet == Set(cb1id, tx1id))
    assert(txs1(cb1id).is_coinbase && txs1(cb1id).inputs.isEmpty)
    assert(!txs1(tx1id).is_coinbase)
    assert(txs1(tx1id).inputs == Seq(BlockFileSource.RawInput(cb0id, 0)))
    assert(txs1(tx1id).outputs.map(o => (o.idx, o.value)) == Seq((0, 3000000000L), (1, 1900000000L)))
  }

  test("lenient parse: corruption quarantines a region via magic-resync, strict throws") {
    val (cbA, cbAid) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(1))))
    val (bA, hA) = block("0" * 64, 1000, Seq(cbA))
    val (cbB, _) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(2))))
    val (bB, hB) = block(hA, 1600, Seq(cbB))
    val (cbC, _) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(3))))
    val (bC, hC) = block(hB, 2200, Seq(cbC))

    // corrupt block B's tx-count varint (offset: 8 frame + 80 header) to the
    // 8-byte form — the parser reads a garbage count and runs off the body
    val corruptB = bB.clone()
    corruptB(8 + 80) = 0xFF.toByte
    val raw = bA ++ corruptB ++ bC

    intercept[Exception](BlockFileSource.parseFile(raw))
    val (blocks, skipped) = BlockFileSource.parseFileLenient(raw)
    // A parses; B is quarantined (resync lands on C's magic); C parses
    assert(blocks.map(_.hash) == Seq(hA, hC))
    assert(skipped == corruptB.length)

    // distributed form: accumulator surfaces the skipped bytes
    val dir = Files.createTempDirectory("graft-blk-corrupt")
    Files.write(Paths.get(dir.toString, "blk00000.dat"), raw)
    val (ds, acc) = BlockFileSource.readLenient(spark, dir.toString)
    assert(ds.collect().map(_.hash).toSet == Set(hA, hC))
    assert(acc.value == corruptB.length)
  }

  /** A stream that yields at most `chunk` bytes per read — stresses
    * parseStream's refill/seam logic the way a real buffered FS stream
    * never would.
    */
  private def drip(raw: Array[Byte], chunk: Int): java.io.InputStream =
    new java.io.InputStream {
      private var i = 0
      override def read(): Int =
        if (i >= raw.length) -1 else { val b = raw(i) & 0xFF; i += 1; b }
      override def read(b: Array[Byte], off: Int, n: Int): Int = {
        if (i >= raw.length) return -1
        val k = math.min(math.min(n, chunk), raw.length - i)
        System.arraycopy(raw, i, b, off, k); i += k; k
      }
    }

  /** Structural equality projection: RawOutput.script is Array[Byte], whose
    * case-class equality is reference equality — normalize to Seq.
    */
  private def norm(bs: Seq[BlockFileSource.RawBlock]) =
    bs.map(b => (b.hash, b.parent_hash, b.ts,
      b.txs.map(t => (t.tx_hash, t.is_coinbase, t.inputs,
        t.outputs.map(o => (o.idx, o.value, o.script.toSeq))))))

  private def streamLenient(raw: Array[Byte], chunk: Int): (Seq[BlockFileSource.RawBlock], Long) = {
    var skipped = 0L
    val blocks = BlockFileSource.parseStream(
      drip(raw, chunk), BlockFileSource.Magic, lenient = true, skipped += _).toVector
    (blocks, skipped)
  }

  test("parseStream ≡ whole-array parse: blocks, skip accounting, seam-crossing resync") {
    val (cbA, cbAid) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(1))))
    val (bA, hA) = block("0" * 64, 1000, Seq(cbA))
    val (cbB, _) = tx(Seq((cbAid, 0)), Seq((4000000000L, p2pkh(2))), witness = true)
    val (bB, hB) = block(hA, 1600, Seq(cbB))

    // 1. clean file + zero padding: identical blocks, zero skips
    val clean = bA ++ bB ++ new Array[Byte](16)
    for (chunk <- Seq(1, 7, 64 * 1024)) {
      val (blocks, skipped) = streamLenient(clean, chunk)
      assert(norm(blocks) == norm(BlockFileSource.parseFile(clean)))
      assert(skipped == 0L)
      // strict streaming form parses the same set
      val strict = BlockFileSource.parseStream(
        drip(clean, chunk), BlockFileSource.Magic, lenient = false, _ => ()).toVector
      assert(strict.map(_.hash) == Seq(hA, hB))
    }

    // 2. a LONG corrupt region (wider than the parser's initial 64 KiB
    //    buffer, no magic inside) between two valid blocks: the resync must
    //    scan across many refills keeping only the 3-byte seam, and the
    //    skip count must equal the whole-array form's exactly
    val junk = Array.fill[Byte](200 * 1024)(0x55)
    val longCorrupt = bA ++ junk ++ bB
    val (arrBlocks, arrSkip) = BlockFileSource.parseFileLenient(longCorrupt)
    assert(arrBlocks.map(_.hash) == Seq(hA, hB) && arrSkip == junk.length)
    for (chunk <- Seq(9, 4096)) {
      val (stBlocks, stSkip) = streamLenient(longCorrupt, chunk)
      assert(norm(stBlocks) == norm(arrBlocks))
      assert(stSkip == arrSkip)
    }

    // 3. corruption with NO later magic (EOF during resync): both forms
    //    quarantine to end-of-file
    val tailCorrupt = bA ++ junk
    val (aB2, aS2) = BlockFileSource.parseFileLenient(tailCorrupt)
    val (sB2, sS2) = streamLenient(tailCorrupt, 4096)
    assert(norm(sB2) == norm(aB2) && sS2 == aS2 && sS2 == junk.length)

    // 4. truncated final record (frame promises more bytes than the file
    //    has): lenient quarantines the stub identically; strict throws
    val truncated = bA ++ bB.dropRight(5)
    val (aB3, aS3) = BlockFileSource.parseFileLenient(truncated)
    val (sB3, sS3) = streamLenient(truncated, 4096)
    assert(norm(sB3) == norm(aB3) && sB3.map(_.hash) == Seq(hA))
    assert(sS3 == aS3 && sS3 == bB.length - 5)
    intercept[Exception] {
      BlockFileSource.parseStream(
        drip(truncated, 4096), BlockFileSource.Magic, lenient = false, _ => ()).toVector
    }

    // 5. hostile frame size (2 GiB claim): the record cap quarantines it
    //    WITHOUT attempting the allocation (the array form only survives
    //    because the file is already in memory), same blocks and accounting
    val withHostile = {
      val h = bA.clone()
      h(4) = 0xFF.toByte; h(5) = 0xFF.toByte; h(6) = 0xFF.toByte; h(7) = 0x7F.toByte
      h ++ bB
    }
    val (aB4, aS4) = BlockFileSource.parseFileLenient(withHostile)
    val (sB4, sS4) = streamLenient(withHostile, 4096)
    assert(norm(sB4) == norm(aB4) && sB4.map(_.hash) == Seq(hB))
    assert(sS4 == aS4 && sS4 == bA.length) // poisoned frame region, resync'd at bB
  }

  test("blk files -> bronze -> gold pipeline end-to-end") {
    val (cb0bytes, cb0id) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(1))))
    val (b0bytes, b0hash) = block("0" * 64, 1000, Seq(cb0bytes))
    val (cb1bytes, _) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(2))))
    val (tx1bytes, tx1id) = tx(Seq((cb0id, 0)),
      Seq((3000000000L, p2pkh(3)), (1900000000L, p2pkh(1))))
    val (b1bytes, _) = block(b0hash, 1600, Seq(cb1bytes, tx1bytes))

    val dir = Files.createTempDirectory("graft-blk2")
    Files.write(Paths.get(dir.toString, "blk00000.dat"), b0bytes)
    Files.write(Paths.get(dir.toString, "blk00001.dat"), b1bytes)

    val bronze = BlockFileSource.toBronze(BlockFileSource.read(spark, dir.toString))
    val ann = BestChain.annotate(bronze("blocks"))
    assert(ann.where(col("is_on_best_chain")).count() == 2)

    val cTxs = GoldStats.chainTxs(bronze("transactions"), ann)
    val rin = Enrich.resolvedInputs(bronze("tx_inputs"), bronze("tx_outputs"))
    val ts = GoldStats.txStats(cTxs, rin, bronze("tx_outputs")).collect()
      .map(r => r.getAs[String]("tx_hash") -> r).toMap
    assert(ts(tx1id).getAs[Long]("balance") == 5000000000L)
    assert(ts(tx1id).getAs[Long]("fee") == 100000000L)
    // script decode produced the real Base58Check P2PKH address of the
    // generated hash160 payload (0x01 * 20)
    val addrs = GoldStats.addressStats(cTxs, rin, bronze("tx_outputs"))
      .select("address").collect().map(_.getString(0)).toSet
    assert(addrs.contains(
      graft.functions.AddressCodec.Base58.encodeCheck(0x00, Array.fill[Byte](20)(1))))
  }

  test("blk parser: regtest-framed files parse with the regtest magic and reject mainnet") {
    val (cbBytes, _) = tx(Seq((coinbasePrev, -1)), Seq((5000000000L, p2pkh(9))))
    val (bBytes, bHash) = block("0" * 64, 1000, Seq(cbBytes), magic = BlockFileSource.RegtestMagic)
    val dir = Files.createTempDirectory("graft-blk-regtest")
    Files.write(Paths.get(dir.toString, "blk00000.dat"), bBytes)

    val parsed = BlockFileSource.read(spark, dir.toString, BlockFileSource.RegtestMagic).collect()
    assert(parsed.map(_.hash).toSeq == Seq(bHash))
    // the same file under the default mainnet magic must fail loudly
    val err = intercept[org.apache.spark.SparkException] {
      BlockFileSource.read(spark, dir.toString).collect()
    }
    assert(err.getMessage.contains("bad magic") ||
      Option(err.getCause).exists(_.getMessage.contains("bad magic")))
  }

  private def unhexStr(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // Real image fixtures: a spec-complete 5x3 RGB PNG (valid CRCs, zlib IDAT)
  // and a minimal JPEG whose marker walk reaches SOF0 (4 rows, 7 cols, 1
  // component).
  private val PngFixture = unhexStr(
    "89504e470d0a1a0a0000000d4948445200000005000000030802000000d45452af" +
      "0000001b49444154789c6360e01291d330b2710b884ac9ab68ea6120c0070006" +
      "bf0c4fd192568a0000000049454e44ae426082")
  private val JpegFixture = unhexStr(
    "ffd8ffe000104a46494600010100000100010000ffc0000b080004000701011100ffd9")

  test("multimodal: real PNG/JPEG header decode, embedding shape, frame sampling") {
    import spark.implicits._
    val media = Seq(
      (1L, "m/1.png", "image", PngFixture),
      (2L, "m/2.jpg", "image", JpegFixture),
      (3L, "m/3.img", "image", Array[Byte](1, 2, 3)),
      (4L, "m/4.vid", "video", Array.tabulate(300)(_.toByte)))
      .toDF("media_id", "uri", "media_type", "bytes")

    val meta = Multimodal.decodeImageMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[Int]("width") == 5 && meta(1L).getAs[Int]("height") == 3 &&
      meta(1L).getAs[Int]("channels") == 3 && meta(1L).getAs[Boolean]("valid"))
    assert(meta(2L).getAs[Int]("width") == 7 && meta(2L).getAs[Int]("height") == 4 &&
      meta(2L).getAs[Int]("channels") == 1 && meta(2L).getAs[Boolean]("valid"))
    assert(!meta(3L).getAs[Boolean]("valid"))

    val emb = Multimodal.embedMedia(media, dim = 8).collect().map(r => r.getLong(0) -> r).toMap
    assert(emb(1L).getSeq[Float](1).length == 8)
    // deterministic: same bytes → same vector
    val emb2 = Multimodal.embedMedia(media, dim = 8).collect().map(r => r.getLong(0) -> r).toMap
    assert(emb(3L).getSeq[Float](1).toSeq == emb2(3L).getSeq[Float](1).toSeq)

    val frames = Multimodal.sampleFrames(media, everyNBytes = 64, maxFrames = 8).collect()
    assert(frames.forall(_.getLong(0) == 4L))
    assert(frames.length == 4) // 300 / 64
  }

  test("image header decode: malformed inputs return None, never throw") {
    import graft.operators.Multimodal.decodeHeader
    assert(decodeHeader(null).isEmpty)
    assert(decodeHeader(Array.emptyByteArray).isEmpty)
    assert(decodeHeader(unhexStr("89504e47")).isEmpty) // truncated PNG sig
    assert(decodeHeader(unhexStr("ffd8ffe0")).isEmpty) // JPEG cut mid-segment
    assert(decodeHeader(unhexStr("ffd8ffda0002")).isEmpty) // SOS before SOF
    assert(decodeHeader(PngFixture.take(20).toArray).isEmpty)
    // corrupt the PNG colortype byte → unknown channels → None
    val bad = PngFixture.clone(); bad(25) = 9
    assert(decodeHeader(bad).isEmpty)
  }

  test("wav header decode: word-aligned chunk walk, hostile sizes, malformed inputs") {
    import graft.operators.Multimodal.decodeWavHeader
    val fmtMono8k = "666d74201000000001000100401f0000401f000001000800"
    val data8 = "6461746108000000deadbeefdeadbeef"
    // ODD-size metadata chunk (3 bytes + mandatory pad byte) before fmt —
    // a walk that forgets RIFF word alignment desyncs here
    val odd = unhexStr("524946463800000057415645" + "4c49535403000000414243" + "00" +
      fmtMono8k + data8)
    assert(decodeWavHeader(odd).contains((1, 8000, 8, Some(1L))))
    // header-only file (no data chunk): valid fmt, no duration
    val headerOnly = unhexStr("524946461c00000057415645" + fmtMono8k)
    assert(decodeWavHeader(headerOnly).contains((1, 8000, 8, None)))
    // hostile 4 GiB chunk size must terminate, not wrap the cursor
    val hostile = unhexStr("524946462c00000057415645" + "4c495354ffffffff" + fmtMono8k)
    assert(decodeWavHeader(hostile).isEmpty)
    assert(decodeWavHeader(null).isEmpty)
    assert(decodeWavHeader(Array.emptyByteArray).isEmpty)
    assert(decodeWavHeader(unhexStr("52494646")).isEmpty)
    // zero-channel fmt is malformed
    assert(decodeWavHeader(unhexStr("524946462c00000057415645" +
      "666d74201000000001000000401f0000401f000001000800" + data8)).isEmpty)
  }

  test("mp4 box walk: size-0 to-EOF boxes, hostile sizes, malformed inputs") {
    import graft.operators.Multimodal.decodeMp4Header
    // moov whose mvhd parses structurally but carries timescale 0 → unparseable
    val mvhd0 = unhexStr("000000246d6f6f76" + // moov size 36
      "0000001c6d766864" + // mvhd size 28: v0 + crea + mod + ts=0 + dur
      "00000000" + "00000000" + "00000000" + "00000000" + "00000064")
    assert(decodeMp4Header(mvhd0).isEmpty)
    // size==0 box (extends to EOF): a trailing mdat after a real moov parses
    val eofBox = unhexStr("000000246d6f6f76" +
      "0000001c6d766864" + // v0, ts=1000, dur=2000
      "00000000" + "00000000" + "00000000" + "000003e8" + "000007d0" +
      "000000006d646174deadbeef") // mdat size 0 -> to EOF
    assert(decodeMp4Header(eofBox).contains((None, Some(2000L), None, None, 0)))
    // a box size below the header size (size=7) is structural corruption
    assert(decodeMp4Header(unhexStr("000000076d6f6f76deadbeef")).isEmpty)
    // largesize declared but buffer ends before the 16-byte header
    assert(decodeMp4Header(unhexStr("000000016d646174")).isEmpty)
    assert(decodeMp4Header(null).isEmpty)
    assert(decodeMp4Header(Array.emptyByteArray).isEmpty)
  }
}
