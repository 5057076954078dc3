package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed by per-partition batch transforms.
  *
  * The Spark-side plumbing is real — schemas, partition-sized batching,
  * iterator-to-iterator transforms (no per-row task overhead, spill-safe,
  * the Scala analogue of `mapInPandas` batch shape). The media codecs
  * themselves are STUBBED with deterministic byte-derived fakes (this
  * container has no image/audio libraries): `decodeImageMeta` parses a fake
  * 16-byte header instead of a JPEG SOF scan; `embedMedia` derives a vector
  * from content hashes instead of a vision model. Swapping in real codecs
  * changes ONLY the function bodies marked STUB — the dataflow, schema and
  * batching contracts stay identical.
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

  /** STUB codec: synthetic image header = "IMG0" magic + width/height/channels
    * int32s (big-endian). Real impl: JPEG/PNG header scan.
    */
  private def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def i32(off: Int): Int =
      ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
        ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
    if (bytes != null && bytes.length >= 16 &&
      bytes(0) == 'I' && bytes(1) == 'M' && bytes(2) == 'G' && bytes(3) == '0')
      Some((i32(4), i32(8), i32(12)))
    else None
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

  /** STUB model: deterministic pseudo-embedding from content (xxhash64 of
    * (bytes, dim index) → [-1, 1] floats). Real impl: batched model
    * inference per partition — which is exactly why this is a partition-wise
    * transform and not a per-row UDF: weights load once per partition, rows
    * flow through in batches.
    */
  def embedMedia(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      // per-partition "model load" happens here (once), then batch-map
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val base = if (bytes == null) 0L else java.util.Arrays.hashCode(bytes).toLong
        val vec = Array.tabulate(dim) { d =>
          val h = base * 6364136223846793005L + d * 1442695040888963407L
          (h >>> 11).toFloat / (1L << 53).toFloat * 2f - 1f
        }
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
