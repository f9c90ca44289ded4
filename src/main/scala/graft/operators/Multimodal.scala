package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * stages (SURVEY.md §2.3, BASELINE.json north star).
  *
  * Architecture: metadata and anything derivable from raw bytes stays in
  * codegen'd Column expressions; decoding runs as `mapPartitions` so one
  * decoder instance serves a whole partition (the Scala analog of a
  * batched pandas-UDF stage — same batch shape, same schema contract).
  * Partitioning is untouched: decode is a narrow map, so at 100 TB it
  * parallelizes with the scan and never shuffles.
  *
  * STUB NOTICE: no image/audio codec ships in this container, so
  * [[StubImageDecoder]] fabricates deterministic dimensions from byte
  * length. The seam ([[ImageDecoder]]) and all Spark-side plumbing
  * (encoders, schema growth, null handling, per-partition reuse) are real
  * — swap in a JAI/javacv-backed decoder without touching callers.
  */
object Multimodal {

  /** Typed metadata struct for an opaque media column — pure Column ops. */
  def mediaMeta(bin: org.apache.spark.sql.Column, mime: String): org.apache.spark.sql.Column =
    struct(
      lit(mime).as("mime_type"),
      octet_length(bin).cast("long").as("n_bytes"),
      md5(bin).as("digest"))

  case class DecodedImage(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** The codec seam: one instance is created per partition, not per row. */
  trait ImageDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedImage
  }

  /** STUB — deterministic fake decode (real codecs unavailable here):
    * dimensions are arithmetic on the byte count, "pixels" echo the head
    * of the payload. Replace via the decoder parameter. */
  object StubImageDecoder extends ImageDecoder {
    def decode(bytes: Array[Byte]): DecodedImage = {
      val n = bytes.length
      DecodedImage(
        width = 64 + n % 512,
        height = 64 + (n * 7) % 512,
        channels = 3,
        pixels = bytes.take(math.min(n, 4096)))
    }
  }

  private def featureSchema(in: StructType): StructType = in
    .add("img_width", IntegerType)
    .add("img_height", IntegerType)
    .add("img_channels", IntegerType)
    .add("img_mean", DoubleType)

  /** Decode + feature-extract stage: appends width/height/channels/mean
    * intensity per row. Null payload -> null features (log-and-null, same
    * contract as the coercions). */
  def imageFeatures(df: DataFrame, binCol: String,
                    decoder: ImageDecoder = StubImageDecoder): DataFrame = {
    val out = featureSchema(df.schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        else {
          val d = decoder.decode(bytes)
          val mean =
            if (d.pixels.isEmpty) 0.0
            else d.pixels.iterator.map(_ & 0xff).sum.toDouble / d.pixels.length
          // Seq[Any] guards against Scala unifying Int+Double to Seq[Double]
          Row.fromSeq(r.toSeq ++ Seq[Any](d.width, d.height, d.channels, mean))
        }
      }
    }(Encoders.row(out))
  }

  /** Resize stage: nearest-neighbor resample of each decoded image to
    * `targetW` × `targetH`, appended as a binary pixel buffer plus its
    * dimensions. The index math is the real kernel; only the decode
    * behind [[ImageDecoder]] is stubbed. Same mapPartitions seam as
    * [[imageFeatures]]: one decoder per partition, narrow op, decoded
    * pixels never cross a shuffle boundary. */
  def resizeImages(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
                   decoder: ImageDecoder = StubImageDecoder): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val out = df.schema
      .add("resized_w", IntegerType)
      .add("resized_h", IntegerType)
      .add("resized", BinaryType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val d = decoder.decode(bytes)
          val outBuf = new Array[Byte](targetW * targetH * d.channels)
          var y = 0
          while (y < targetH) {
            val sy = y * d.height / targetH
            var x = 0
            while (x < targetW) {
              val sx = x * d.width / targetW
              val src = (sy * d.width + sx) * d.channels
              val dst = (y * targetW + x) * d.channels
              var c = 0
              while (c < d.channels) {
                outBuf(dst + c) =
                  if (src + c < d.pixels.length) d.pixels(src + c) else 0
                c += 1
              }
              x += 1
            }
            y += 1
          }
          Row.fromSeq(r.toSeq ++ Seq[Any](targetW, targetH, outBuf))
        }
      }
    }(Encoders.row(out))
  }

  /** Frame sampling for video-shaped payloads: fixed-size frames, keep
    * every `every`-th, one output row per kept frame. flatMap = narrow op;
    * row count grows but partitioning is preserved. */
  def frameSample(df: DataFrame, binCol: String, frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val out = df.schema.add("frame_idx", IntegerType).add("frame", BinaryType)
    val idx = df.schema.fieldIndex(binCol)
    df.flatMap { r =>
      val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
      if (bytes == null) Iterator.empty
      else bytes.grouped(frameBytes).zipWithIndex.collect {
        case (frame, i) if i % every == 0 => Row.fromSeq(r.toSeq ++ Seq(i, frame))
      }
    }(Encoders.row(out))
  }

  /** Frame count derivable without decoding — stays in codegen. */
  def frameCount(bin: org.apache.spark.sql.Column, frameBytes: Int): org.apache.spark.sql.Column =
    ceil(octet_length(bin).cast("double") / frameBytes).cast("long")
}
