package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Raw `blk*.dat` block-file source (SURVEY.md §2.1 S1) — replaces the
  * reference's bitcoinj `BlockFileLoader` (BlockchainToGraph.java:358–379)
  * with a from-scratch parser of the public Bitcoin wire format, run as a
  * distributed flatMap over `spark.read.format("binaryFile")`.
  *
  * One task per file; parsing is pure and embarrassingly parallel, so 100 TB
  * of block files is just ~66k files fanned across executors — vs the
  * reference's single-threaded driver loop. Chain ordering is NOT done here
  * (files arrive out of order, BlockchainToGraph.java:389–412): the parsed
  * bronze rows carry prev-hash pointers and [[graft.chain.BestChain]] orders
  * them set-wise.
  */
object BlockFileSource {

  case class RawInput(prev_tx_hash: String, prev_index: Int)
  case class RawOutput(idx: Int, value: Long, script: Array[Byte])
  case class RawTx(tx_hash: String, is_coinbase: Boolean,
      inputs: Seq[RawInput], outputs: Seq[RawOutput])
  case class RawBlock(hash: String, parent_hash: String, ts: Long, txs: Seq[RawTx])

  /** Start-of-record magics, big-endian as they appear in the file (public
    * chain parameters; the reference inherits them from bitcoinj's
    * NetworkParameters). Mainnet is the default everywhere.
    */
  val Magic: Int = 0xf9beb4d9
  val TestnetMagic: Int = 0x0b110907
  val RegtestMagic: Int = 0xfabfb5da
  val SignetMagic: Int = 0x0a03cf40

  private def sha256d(bytes: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(bytes, from, len)
    md.digest(md.digest())
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Little-endian hash bytes → big-endian display hex (Bitcoin convention).
    * Table-driven, zero intermediate allocations: the format-string version
    * built a java.util.Formatter + regex Matcher PER BYTE — 64 per hash,
    * several hashes per tx, millions per blk file — which showed up as both
    * GC pressure (an 8g 30× parse OOM'd with this frame on top) and parse
    * CPU.
    */
  private def hashHex(h: Array[Byte]): String = {
    val out = new Array[Char](h.length * 2)
    var i = h.length - 1
    var j = 0
    while (i >= 0) {
      val b = h(i) & 0xFF
      out(j) = HexChars(b >>> 4)
      out(j + 1) = HexChars(b & 0xF)
      i -= 1; j += 2
    }
    new String(out)
  }

  private final class Reader(val buf: ByteBuffer) {
    def u8(): Int = buf.get() & 0xFF
    def u32(): Long = buf.getInt() & 0xFFFFFFFFL
    def i32(): Int = buf.getInt()
    def i64(): Long = buf.getLong()
    def varInt(): Long = u8() match {
      case 0xfd => buf.getShort() & 0xFFFFL
      case 0xfe => buf.getInt() & 0xFFFFFFFFL
      case 0xff => buf.getLong()
      case n => n.toLong
    }
    def bytes(n: Int): Array[Byte] = { val a = new Array[Byte](n); buf.get(a); a }
    def skip(n: Int): Unit = buf.position(buf.position() + n)
  }

  /** Parse one transaction; returns (tx, txid source range) handling the
    * segwit marker (txid excludes witness data, BIP-141).
    */
  private def parseTx(r: Reader, raw: Array[Byte]): RawTx = {
    val start = r.buf.position()
    r.i32() // version
    var segwit = false
    val mark = r.buf.position()
    if (r.u8() == 0x00) {
      if (r.u8() == 0x01) segwit = true
      else r.buf.position(mark)
    } else r.buf.position(mark)
    val afterMarker = r.buf.position()
    val nIn = r.varInt().toInt
    val inputs = (0 until nIn).map { _ =>
      val prev = r.bytes(32)
      val vout = r.u32().toInt
      val scriptLen = r.varInt().toInt
      r.skip(scriptLen)
      r.u32() // sequence
      RawInput(hashHex(prev), vout)
    }
    val nOut = r.varInt().toInt
    val outputs = (0 until nOut).map { i =>
      val value = r.i64()
      val scriptLen = r.varInt().toInt
      RawOutput(i, value, r.bytes(scriptLen))
    }
    val afterOutputs = r.buf.position()
    if (segwit) {
      var i = 0
      while (i < nIn) { // witness stacks, excluded from txid
        val items = r.varInt().toInt
        var j = 0
        while (j < items) { r.skip(r.varInt().toInt); j += 1 }
        i += 1
      }
    }
    r.i32() // locktime
    val end = r.buf.position()
    val txid =
      if (!segwit) hashHex(sha256d(raw, start, end - start))
      else { // txid = version ++ (body without marker/witness) ++ locktime
        val body = new java.io.ByteArrayOutputStream(end - start)
        body.write(raw, start, 4)
        body.write(raw, afterMarker, afterOutputs - afterMarker)
        body.write(raw, end - 4, 4)
        val b = body.toByteArray
        hashHex(sha256d(b, 0, b.length))
      }
    val isCoinbase = inputs.length == 1 &&
      inputs.head.prev_tx_hash == "0" * 64 && inputs.head.prev_index == -1
    RawTx(txid, isCoinbase,
      if (isCoinbase) Seq.empty else inputs, outputs)
  }

  /** Parse one blk-file's bytes into blocks (magic-framed records).
    * Strict: any framing or body corruption throws (kills the task — the
    * right default for trusted node output, and what the reference does:
    * BlockchainToGraph.java:431 asserts-and-dies).
    */
  def parseFile(raw: Array[Byte], networkMagic: Int = Magic): Seq[RawBlock] =
    parseCore(raw, networkMagic, lenient = false)._1

  /** Lenient parse: on corruption, RESYNC at the next magic marker and keep
    * going, returning (blocks, bytes skipped). At 100 TB one flipped byte in
    * one of ~66k files must quarantine a region, not kill the scan.
    */
  def parseFileLenient(raw: Array[Byte], networkMagic: Int = Magic): (Seq[RawBlock], Long) =
    parseCore(raw, networkMagic, lenient = true)

  /** The 4 magic bytes as they appear on disk (big-endian constant). */
  private def magicBytes(networkMagic: Int): Array[Byte] = Array(
    (networkMagic >>> 24).toByte, (networkMagic >>> 16).toByte,
    (networkMagic >>> 8).toByte, networkMagic.toByte)

  private def findMagic(raw: Array[Byte], from: Int, m: Array[Byte]): Int = {
    var i = math.max(from, 0)
    while (i + 4 <= raw.length) {
      if (raw(i) == m(0) && raw(i + 1) == m(1) && raw(i + 2) == m(2) && raw(i + 3) == m(3))
        return i
      i += 1
    }
    -1
  }

  private def parseCore(
      raw: Array[Byte], networkMagic: Int, lenient: Boolean): (Seq[RawBlock], Long) = {
    var skipped = 0L
    val out = parseIterator(raw, networkMagic, lenient, skipped += _).toVector
    (out, skipped)
  }

  /** Incremental record-at-a-time parse — the form the distributed scans
    * flatMap over. A whole-file parse materializes the ENTIRE file's block
    * graph (tens of thousands of nested RawBlock/RawTx objects per 27 MB
    * file at corpus scale) before the first row reaches the downstream
    * encoder; with 32 such tasks concurrent that transient graph is
    * gigabytes of driver-JVM heap in local mode (the measured bk0@30×
    * OOM-at-8g trigger) and the same multiplier per executor at 100 TB. The
    * iterator yields one block per `next()`, so each block is encoded to
    * Tungsten bytes (or consumed) and becomes garbage before the next is
    * built — per-task transient heap drops from O(file) to O(block).
    * `onSkip` fires once per quarantined corrupt region (lenient mode).
    */
  private[graft] def parseIterator(
      raw: Array[Byte], networkMagic: Int, lenient: Boolean,
      onSkip: Long => Unit): Iterator[RawBlock] = new Iterator[RawBlock] {
    private val r = new Reader(ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN))
    private val m = magicBytes(networkMagic)
    private var nextBlock: RawBlock = _
    private var done = false
    private def advance(): Unit = {
      while (nextBlock == null && !done) {
        if (r.buf.remaining() < 8) { done = true; return }
        val recordStart = r.buf.position()
        try {
          val magic = ((r.u8()) | (r.u8() << 8) | (r.u8() << 16) | (r.u8() << 24))
          if (magic == 0) { /* zero padding at file tail */ }
          else if (Integer.reverseBytes(magic) != networkMagic)
            throw new IllegalArgumentException(f"bad magic 0x$magic%08x")
          else {
            val size = r.u32().toInt
            val blockStart = r.buf.position()
            val headerHash = hashHex(sha256d(raw, blockStart, 80))
            r.i32() // version
            val prev = r.bytes(32)
            r.skip(32) // merkle root
            val time = r.u32()
            r.skip(8) // bits, nonce
            val nTx = r.varInt().toInt
            val txs = (0 until nTx).map(_ => parseTx(r, raw))
            require(r.buf.position() == blockStart + size,
              s"block size mismatch: read ${r.buf.position() - blockStart}, framed $size")
            nextBlock = RawBlock(headerHash, hashHex(prev), time, txs)
          }
        } catch {
          case e: Throwable if lenient =>
            // quarantine [recordStart, next magic) and carry on
            val next = findMagic(raw, recordStart + 1, m)
            if (next < 0) {
              onSkip(raw.length - recordStart)
              done = true
            } else {
              onSkip(next - recordStart)
              r.buf.position(next)
            }
        }
      }
    }
    def hasNext: Boolean = { if (nextBlock == null && !done) advance(); nextBlock != null }
    def next(): RawBlock = {
      if (!hasNext) throw new NoSuchElementException("exhausted blk file")
      val b = nextBlock; nextBlock = null; b
    }
  }

  /** Distributed scan: every blk file → parsed blocks. */
  def read(spark: SparkSession, path: String, networkMagic: Int = Magic): Dataset[RawBlock] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "blk*.dat")
      .load(path)
      .select("content").as[Array[Byte]]
      .flatMap(parseIterator(_, networkMagic, lenient = false, _ => ()))
  }

  /** [[read]] with per-record corruption quarantine: damaged regions are
    * skipped via magic-resync instead of killing the task, and the total
    * skipped byte count surfaces in the returned accumulator (valid after an
    * action) — monitor it, alert on nonzero, but finish the 100 TB scan.
    */
  def readLenient(spark: SparkSession, path: String, networkMagic: Int = Magic)
      : (Dataset[RawBlock], org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("graft.corruptBytesSkipped")
    val ds = spark.read.format("binaryFile")
      .option("pathGlobFilter", "blk*.dat")
      .load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        parseIterator(bytes, networkMagic, lenient = true, acc.add(_))
      }
    (ds, acc)
  }

  /** The previous [[toBronze]] call's cached parse: each call swaps its
    * dataset in and unpersists the predecessor, so repeated end-to-end runs
    * (bench reruns of bk0) hold at most ONE cached copy of the parsed corpus
    * instead of accumulating one per run — at 50k blocks each leaked copy is
    * hundreds of MB of storage memory and the later runs thrash on eviction.
    */
  private val lastParsed =
    new java.util.concurrent.atomic.AtomicReference[Dataset[RawBlock]](null)

  /** Bronze projection: the four relational tables of the chain layer
    * (SURVEY.md §1.3) from parsed blocks, with script→address decode (C7).
    * The parse is cached (four tables consume it); the cache is run-scoped —
    * the next toBronze call drops it.
    */
  def toBronze(blocks: Dataset[RawBlock]): Map[String, DataFrame] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    // SER, not plain cache(): the parsed corpus is millions of small nested
    // objects deserialized; storing it as Tungsten bytes keeps it out of the
    // GC trace set (a deserialized copy measurably stalls whole-heap GCs).
    val b = blocks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    Option(lastParsed.getAndSet(b)).foreach(_.unpersist(blocking = false))
    // The genesis header's prev-hash is all zeros on the wire; the chain
    // layer marks roots with NULL.
    val blocksDf = b.select(
      col("hash"),
      when(col("parent_hash") === "0" * 64, lit(null)).otherwise(col("parent_hash"))
        .as("parent_hash"),
      col("ts"))
    val txsDf = b.select(col("hash").as("block_hash"), explode(col("txs")).as("tx"))
      .select(col("tx.tx_hash"), col("block_hash"), col("tx.is_coinbase")).toDF()
    val txFlat = b.select(explode(col("txs")).as("tx"))
    val inputsDf = txFlat
      .select(col("tx.tx_hash").as("tx_hash"), explode(col("tx.inputs")).as("i"))
      .select(col("tx_hash"), col("i.prev_tx_hash"), col("i.prev_index"))
    val outputsDf = txFlat
      .select(col("tx.tx_hash").as("tx_hash"), explode(col("tx.outputs")).as("o"))
      .select(col("tx_hash"), col("o.idx").as("idx"), col("o.value").as("value"),
        GraftFunctions.script_to_address(col("o.script")).as("address"))
    Map("blocks" -> blocksDf, "transactions" -> txsDf,
      "tx_inputs" -> inputsDf, "tx_outputs" -> outputsDf)
  }
}
