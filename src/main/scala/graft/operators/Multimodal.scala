package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed by per-partition batch transforms.
  *
  * The Spark-side plumbing is real — schemas, partition-sized batching,
  * iterator-to-iterator transforms (no per-row task overhead, spill-safe,
  * the Scala analogue of `mapInPandas` batch shape). Header decode is a REAL
  * pure-JVM byte scan of the published JPEG (ISO/IEC 10918 marker segments)
  * and PNG (RFC 2083 IHDR) formats — no image library needed to extract
  * dimensions/channels. `embedMedia` remains a deterministic STUB (a vision
  * model does not fit this container); swapping a real model in changes only
  * the marked function body — the dataflow, schema and batching contracts
  * stay identical.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("uri", StringType),
    StructField("media_type", StringType), // image | audio | video
    StructField("bytes", BinaryType)))

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("valid", BooleanType, nullable = false)))

  /** (width, height, channels) from real image headers — PNG IHDR or a JPEG
    * marker-segment walk to the first SOFn. Malformed/truncated/unknown
    * bytes → None, never an exception (a poisoned row must not kill a task
    * processing a billion images).
    */
  private[graft] def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    def u16(off: Int): Int = ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    def i32(off: Int): Int =
      ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
        ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)

    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first:
    // len(4) "IHDR" width(4) height(4) bitdepth(1) colortype(1)
    if (bytes.length >= 26 &&
      (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
      bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val channels = (bytes(25) & 0xFF) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      val w = i32(16); val h = i32(20)
      return if (w > 0 && h > 0) Some((w, h, channels)) else None
    }

    // JPEG: SOI then marker segments; dims live in the first SOFn
    // (C0–CF except DHT C4, JPG C8, DAC CC):
    // FF Cn len(2) precision(1) height(2) width(2) nComponents(1)
    if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) {
      var pos = 2
      while (pos + 4 <= bytes.length) {
        if ((bytes(pos) & 0xFF) != 0xFF) return None // marker desync
        var marker = bytes(pos + 1) & 0xFF
        while (marker == 0xFF && pos + 2 < bytes.length) { // fill bytes
          pos += 1; marker = bytes(pos + 1) & 0xFF
        }
        if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          if (pos + 10 > bytes.length) return None
          val h = u16(pos + 5); val w = u16(pos + 7)
          val c = bytes(pos + 9) & 0xFF
          return if (w > 0 && h > 0 && c > 0) Some((w, h, c)) else None
        } else if (marker == 0xD8 || marker == 0x01 ||
          (marker >= 0xD0 && marker <= 0xD7)) {
          pos += 2 // standalone marker, no length field
        } else if (marker == 0xD9 || marker == 0xDA) {
          return None // EOI / start-of-scan before any SOF: no dims
        } else {
          pos += 2 + u16(pos + 2) // length includes itself
        }
      }
      return None
    }
    None
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", LongType),
    StructField("valid", BooleanType, nullable = false)))

  /** (channels, sampleRate, bitsPerSample, durationMs) from a real WAV/RIFF
    * header walk (RIFF 1991 spec: "RIFF" size "WAVE", then chunks; PCM
    * fields live in "fmt ", payload length in "data"). Chunks before "fmt "
    * (LIST/INFO metadata) are skipped by the walk, as the spec requires.
    * Malformed/truncated bytes → None, same poison discipline as
    * [[decodeHeader]]. durationMs is None when no "data" chunk is present
    * (streaming/header-only files).
    */
  private[graft] def decodeWavHeader(bytes: Array[Byte])
      : Option[(Int, Int, Int, Option[Long])] = {
    if (bytes == null || bytes.length < 12) return None
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12L
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataSize: Option[Long] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val p = pos.toInt
      val id = tag(p)
      val size = u32(p + 4)
      if (id == "fmt ") {
        if (size < 16 || p + 8 + 16 > bytes.length) return None
        val channels = u16(p + 10)
        val rate = u32(p + 12)
        val byteRate = u32(p + 16)
        val bits = u16(p + 22)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0) return None
        fmt = Some((channels, rate.toInt, bits, byteRate))
      } else if (id == "data") {
        dataSize = Some(size)
      }
      // chunks are word-aligned: odd sizes carry a pad byte; Long arithmetic
      // so a hostile 4 GiB size field cannot wrap pos back into the buffer
      pos += 8L + size + (size & 1L)
    }
    fmt.map { case (ch, rate, bits, byteRate) =>
      val dur = dataSize.collect { case d if byteRate > 0 => d * 1000L / byteRate }
      (ch, rate, bits, dur)
    }
  }

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("brand", StringType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("track_count", IntegerType),
    StructField("valid", BooleanType, nullable = false)))

  /** (brand, durationMs, width, height, trackCount) from a real MP4 /
    * ISO-BMFF (ISO/IEC 14496-12) box walk: `ftyp` major brand, `moov/mvhd`
    * timescale+duration (version 0 and 1 layouts), one `moov/trak/tkhd` per
    * track (16.16 fixed-point dims; the first track with nonzero dims is the
    * video track). Handles 64-bit largesize boxes (size == 1) and
    * size == 0 ("to end of file"). A box whose declared size overruns the
    * buffer (truncated download) or no parseable `mvhd` → None, same poison
    * discipline as [[decodeHeader]].
    */
  private[graft] def decodeMp4Header(bytes: Array[Byte])
      : Option[(Option[String], Option[Long], Option[Int], Option[Int], Int)] = {
    if (bytes == null || bytes.length < 8) return None
    def u16(off: Int): Int = ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    var brand: Option[String] = None
    var durMs: Option[Long] = None
    var dims: Option[(Int, Int)] = None
    var traks = 0

    /** Walk the boxes in [start, end); false on structural corruption. */
    def walk(start: Long, end: Long)(f: (String, Long, Long) => Boolean): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        val p = pos.toInt
        val typ = tag(p + 4)
        var hdr = 8L
        var size = u32(p)
        if (size == 1) { // 64-bit largesize
          if (pos + 16 > end) return false
          size = u64(p + 8); hdr = 16L
        } else if (size == 0) size = end - pos // box extends to end of file
        if (size < hdr || pos + size > end) return false
        if (!f(typ, pos + hdr, pos + size)) return false
        pos += size
      }
      true
    }

    val ok = walk(0L, bytes.length.toLong) {
      case ("ftyp", cs, ce) =>
        if (ce - cs >= 4) brand = Some(tag(cs.toInt))
        true
      case ("moov", ms, me) =>
        walk(ms, me) {
          case ("mvhd", cs, ce) =>
            val c = cs.toInt
            val v = bytes(c) & 0xFF
            val need = if (v == 1) 32L else 20L
            if (ce - cs < need) false
            else {
              val (ts, dur) =
                if (v == 1) (u32(c + 20), u64(c + 24)) else (u32(c + 12), u32(c + 16))
              if (ts <= 0) false
              else { durMs = Some(dur * 1000L / ts); true }
            }
          case ("trak", ts, te) =>
            traks += 1
            walk(ts, te) {
              case ("tkhd", cs, ce) =>
                val c = cs.toInt
                val v = bytes(c) & 0xFF
                val wOff = if (v == 1) 88 else 76 // 16.16 fixed, height follows
                if (ce - cs < wOff + 8) false
                else {
                  val w = u16(c + wOff); val h = u16(c + wOff + 4)
                  if (dims.isEmpty && w > 0 && h > 0) dims = Some((w, h))
                  true
                }
              case _ => true
            }
          case _ => true
        }
      case _ => true // mdat/free/...: skip
    }
    if (!ok || durMs.isEmpty) None
    else Some((brand, durMs, dims.map(_._1), dims.map(_._2), traks))
  }

  /** Decode video-container metadata for every row — same narrow
    * iterator-to-iterator shape as [[decodeImageMeta]].
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        decodeMp4Header(r.getAs[Array[Byte]](1)) match {
          case Some((brand, dur, w, h, n)) =>
            Row(id, brand.orNull, dur.orNull, w.orNull, h.orNull, n, true)
          case None => Row(id, null, null, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rows, videoMetaSchema)
  }

  /** Decode audio metadata for every row — same narrow iterator-to-iterator
    * shape as [[decodeImageMeta]].
    */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        decodeWavHeader(r.getAs[Array[Byte]](1)) match {
          case Some((ch, rate, bits, dur)) => Row(id, ch, rate, bits, dur.orNull, true)
          case None => Row(id, null, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rows, audioMetaSchema)
  }

  /** Decode image metadata for every row — iterator-to-iterator per
    * partition, constant memory, preserves input partitioning (narrow).
    */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        decodeHeader(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, c)) => Row(id, w, h, c, true)
          case None => Row(id, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rows, imageMetaSchema)
  }

  /** splitmix64 finalizer (Steele/Lea/Flood 2014, public domain; the JDK's
    * SplittableRandom mix) — fixes the projection matrix deterministically.
    */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Content embedding WITHOUT a model: byte-histogram features (256-dim L1
    * normalized — byte distribution is a real content signal: similar blobs
    * have similar histograms) projected through a FIXED seeded ±1 random
    * matrix (Johnson–Lindenstrauss / Achlioptas 2001 sign projection) and
    * L2-normalized, so cosine geometry downstream (near-dup, ANN) behaves
    * like a real embedding space. Fully deterministic — the matrix derives
    * from splitmix64(seed, d, b), no RNG state — hence reproducible across
    * partitionings, sessions and engines.
    *
    * This is the declared MODEL STUB boundary (§2.11): a neural encoder does
    * not fit this container. Swapping one in replaces only the
    * histogram+projection body below; the dataflow contract — partition-wise
    * transform, weights ("model") built once per partition, rows streamed
    * through in batches, (media_id, float vector) out — is exactly what
    * batched inference needs and is what the specs pin.
    */
  def embedMedia(media: DataFrame, dim: Int = 16, seed: Long = 42L): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      // per-partition "model load": the dim×256 sign matrix, built once
      val proj = Array.tabulate(dim, 256) { (d, b) =>
        if ((mix64(mix64(seed + d) ^ b.toLong) & 1L) == 0L) 1f else -1f
      }
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val vec = new Array[Float](dim)
        if (bytes != null && bytes.length > 0) {
          // count in Long: a float histogram saturates at 2^24 (adding 1f
          // to 16777216f is a no-op), silently skewing embeddings of blobs
          // over ~16 MB with a dominant byte value
          val hist = new Array[Long](256)
          var i = 0
          while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1L; i += 1 }
          val inv = 1.0f / bytes.length
          var d = 0
          while (d < dim) {
            val row = proj(d)
            var s = 0f; var b = 0
            while (b < 256) { s += row(b) * (hist(b) * inv); b += 1 }
            vec(d) = s
            d += 1
          }
          var sq = 0.0; d = 0
          while (d < dim) { sq += vec(d).toDouble * vec(d); d += 1 }
          if (sq > 0) {
            val n = (1.0 / math.sqrt(sq)).toFloat
            d = 0
            while (d < dim) { vec(d) *= n; d += 1 }
          }
        } // null/empty bytes → zero vector (a poisoned row must not kill the task)
        Row(id, vec)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Frame sampling for video columns: one output row per sampled frame
    * offset — the explode-shaped generator (frame decode STUBBED as a byte
    * slice; real impl seeks keyframes).
    */
  def sampleFrames(media: DataFrame, everyNBytes: Int = 64, maxFrames: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType)))
    val rows = media.where(col("media_type") === "video")
      .select("media_id", "bytes").rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val n = math.min(maxFrames, math.max(bytes.length / everyNBytes, 0))
          (0 until n).iterator.map { f =>
            Row(id, f, java.util.Arrays.copyOfRange(bytes, f * everyNBytes, (f + 1) * everyNBytes))
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
