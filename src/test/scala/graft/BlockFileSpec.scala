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
  private def block(prevHashHex: String, time: Long, txs: Seq[Array[Byte]]): (Array[Byte], String) = {
    val hdr = new W
    hdr.u32(2).bytes(hexLe(prevHashHex)).bytes(new Array[Byte](32)).u32(time).u32(0x1d00ffffL).u32(42)
    val header = hdr.result
    val blk = new W
    blk.bytes(header).varInt(txs.size)
    txs.foreach(blk.bytes)
    val body = blk.result
    val rec = new W
    rec.u32(0xd9b4bef9L).u32(body.length).bytes(body)
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
    // script decode produced the P2PKH hex address of payload byte 1
    val addrs = GoldStats.addressStats(cTxs, rin, bronze("tx_outputs"))
      .select("address").collect().map(_.getString(0)).toSet
    assert(addrs.contains("1" + "01" * 20))
  }

  test("multimodal: header decode, embedding shape, frame sampling") {
    import spark.implicits._
    def img(w: Int, h: Int, c: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(16)
      b.put('I'.toByte).put('M'.toByte).put('G'.toByte).put('0'.toByte)
      b.putInt(w).putInt(h).putInt(c)
      b.array()
    }
    val media = Seq(
      (1L, "m/1.img", "image", img(640, 480, 3)),
      (2L, "m/2.img", "image", Array[Byte](1, 2, 3)),
      (3L, "m/3.vid", "video", Array.tabulate(300)(_.toByte)))
      .toDF("media_id", "uri", "media_type", "bytes")

    val meta = Multimodal.decodeImageMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[Int]("width") == 640 && meta(1L).getAs[Boolean]("valid"))
    assert(!meta(2L).getAs[Boolean]("valid"))

    val emb = Multimodal.embedMedia(media, dim = 8).collect().map(r => r.getLong(0) -> r).toMap
    assert(emb(1L).getSeq[Float](1).length == 8)
    // deterministic: same bytes → same vector
    val emb2 = Multimodal.embedMedia(media, dim = 8).collect().map(r => r.getLong(0) -> r).toMap
    assert(emb(3L).getSeq[Float](1).toSeq == emb2(3L).getSeq[Float](1).toSeq)

    val frames = Multimodal.sampleFrames(media, everyNBytes = 64, maxFrames = 8).collect()
    assert(frames.forall(_.getLong(0) == 3L))
    assert(frames.length == 4) // 300 / 64
  }
}
