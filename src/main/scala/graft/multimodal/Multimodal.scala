package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages implemented as `mapPartitions` batch transforms (the JVM
  * equivalent of the Python-side `mapInPandas` pattern — same schema,
  * partitioning, and batch shape).
  *
  * REAL here: container sniffing (magic bytes), PNG dimension parsing
  * (IHDR is at a fixed offset — pure byte inspection), the DataFrame
  * schema/encoder plumbing, and the partition-wise batching.
  *
  * STUBBED (clearly marked): pixel/sample decoding — the actual image/audio
  * codecs aren't available in this container, so [[StubDecoder]] produces a
  * deterministic hash-seeded fake with the right shape. Swap `decoder` for
  * a real codec-backed implementation in production.
  */
object Multimodal {

  // ---- real: container sniffing ----------------------------------------

  /** Magic-byte container detection (no codec needed). */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (bytes.length > i) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else "unknown"
  }

  /** PNG width/height from the IHDR chunk (bytes 16..23) — real parsing. */
  def pngDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (sniffFormat(bytes) == "png" && bytes.length >= 24) {
      def be32(o: Int): Int =
        ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      Some((be32(16), be32(20)))
    } else None

  // ---- stub: decode ----------------------------------------------------

  /** Deterministic fake decoder: seeds pseudo-pixels from a content hash.
    * STUB — replace with a codec-backed decoder in production (???-grade
    * placeholder semantics; shape and determinism are the contract). */
  object StubDecoder {
    def decodeToFloats(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L // FNV-ish rolling seed over content
      var i = 0
      while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
      val out = new Array[Float](dim)
      var j = 0
      var s = h
      while (j < dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(j) = ((s >>> 33).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  // ---- real plumbing over stubbed decode --------------------------------

  private def withMappedPartitions(df: DataFrame, outSchema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions(fn)(enc)
  }

  /** Attach sniffed metadata columns to a binary payload column. */
  def withMetadata(df: DataFrame, binCol: String): DataFrame = {
    val sniff = udf((b: Array[Byte]) => if (b == null) "unknown" else sniffFormat(b))
    val dims = udf((b: Array[Byte]) => if (b == null) None else pngDims(b))
    df.withColumn("mm_format", sniff(col(binCol)))
      .withColumn("mm_bytes", length(col(binCol)))
      .withColumn("mm_dims", dims(col(binCol)))
  }

  /** Feature extraction: binary -> float embedding of `dim` values, one
    * output row per input row, batched per partition (mapInPandas shape).
    * Decode itself is stubbed; partitioning/schema/batching are real. */
  def extractFeatures(df: DataFrame, binCol: String, idCol: String,
                      dim: Int = 16): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    val idIdx = inSchema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    withMappedPartitions(df, outSchema) { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row(r.get(idIdx), StubDecoder.decodeToFloats(
          if (bytes == null) Array.emptyByteArray else bytes, dim).toSeq)
      }
    }
  }

  /** Frame sampling: one row per sampled frame index (video -> frames).
    * Frame decode stubbed; the row-explosion shape and lineage are real. */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String,
                   everyN: Int = 10, maxFrames: Int = 4): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binCol)
    val idIdx = inSchema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    withMappedPartitions(df, outSchema) { rows =>
      rows.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]](binIdx)).getOrElse(Array.emptyByteArray)
        (0 until maxFrames).iterator.map { f =>
          // STUB frame payload: content-derived slice stands in for a decoded frame
          val start = math.min(bytes.length, f * everyN)
          Row(r.get(idIdx), f * everyN, bytes.drop(start).take(32))
        }
      }
    }
  }
}
