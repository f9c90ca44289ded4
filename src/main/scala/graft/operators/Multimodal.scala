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
  * Codecs: the default [[JdkImageDecoder]] is a real decoder built on
  * `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — ships with every JDK, zero
  * extra dependencies); WAV audio decodes through `javax.sound.sampled`
  * ([[JdkWavDecoder]]). [[StubImageDecoder]] remains as a deterministic
  * test double for payloads that are not real images (e.g. q46's
  * text-cast-to-binary fixtures, where the stub's arithmetic keeps the
  * stage oracle-checkable). Unreadable payloads follow the same
  * log-and-null contract as the scalar coercions: features null, row kept.
  */
object Multimodal {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Wraps a partition's output iterator so undecodable-payload counts are
    * logged ONCE per partition when it completes — the log half of the
    * log-and-null contract, without per-row spam (the jsonl reader's
    * corrupt-line counter, applied to codecs). */
  private def logFailures[A](it: Iterator[A], stage: String,
                             failed: () => Long): Iterator[A] =
    new Iterator[A] {
      private var logged = false
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !logged && failed() > 0) {
          logged = true
          log.warn(s"$stage: ${failed()} undecodable payload(s) -> null features")
        }
        h
      }
      def next(): A = it.next()
    }

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

  /** Test double — deterministic fake decode for payloads that are not
    * real images: dimensions are arithmetic on the byte count, "pixels"
    * echo the head of the payload. Used where an arithmetic oracle is
    * wanted (q46); real corpora use [[JdkImageDecoder]]. */
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

  /** Real image decode on the JDK's built-in codecs (PNG/JPEG/BMP/GIF via
    * `javax.imageio.ImageIO` — no external dependency). Pixels come out
    * row-major interleaved: 1 channel for grayscale, 3 (RGB) for opaque
    * color, 4 (RGBA) when the color model carries alpha. Throws on
    * unreadable payloads; the mapPartitions stages catch and null the
    * features (log-and-null contract). */
  object JdkImageDecoder extends ImageDecoder {
    def decode(bytes: Array[Byte]): DecodedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) throw new IllegalArgumentException("unreadable image payload")
      fromBuffered(img)
    }
  }

  /** Shared BufferedImage → [[DecodedImage]] conversion (sRGB regardless
    * of the file's raster layout — one bulk getRGB pass; per-pixel
    * getRGB dispatches through the ColorModel on every call, several
    * times slower on the hot decode path). */
  private[operators] def fromBuffered(
      img: java.awt.image.BufferedImage): DecodedImage = {
    val w = img.getWidth
    val h = img.getHeight
    val cm = img.getColorModel
    val channels =
      if (cm.hasAlpha) 4 else if (cm.getNumColorComponents == 1) 1 else 3
    val argbs = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h * channels)
    var p = 0
    var i = 0
    while (p < argbs.length) {
      val argb = argbs(p)
      out(i) = ((argb >> 16) & 0xff).toByte
      if (channels >= 3) {
        out(i + 1) = ((argb >> 8) & 0xff).toByte
        out(i + 2) = (argb & 0xff).toByte
      }
      if (channels == 4) out(i + 3) = ((argb >>> 24) & 0xff).toByte
      i += channels
      p += 1
    }
    DecodedImage(w, h, channels, out)
  }

  private def featureSchema(in: StructType): StructType = in
    .add("img_width", IntegerType)
    .add("img_height", IntegerType)
    .add("img_channels", IntegerType)
    .add("img_mean", DoubleType)

  /** Decode + feature-extract stage: appends width/height/channels/mean
    * intensity per row. Null or unreadable payload -> null features
    * (log-and-null, same contract as the coercions). */
  def imageFeatures(df: DataFrame, binCol: String,
                    decoder: ImageDecoder = JdkImageDecoder): DataFrame = {
    val out = featureSchema(df.schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try Some(decoder.decode(bytes))
               catch { case _: Exception => failed += 1; None }
        decoded match {
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
          case Some(d) =>
            val mean =
              if (d.pixels.isEmpty) 0.0
              else d.pixels.iterator.map(_ & 0xff).sum.toDouble / d.pixels.length
            // Seq[Any] guards against Scala unifying Int+Double to Seq[Double]
            Row.fromSeq(r.toSeq ++ Seq[Any](d.width, d.height, d.channels, mean))
        }
      }
      logFailures(mapped, "imageFeatures", () => failed)
    }(Encoders.row(out))
  }

  /** Difference-hash (dHash) perceptual fingerprint — the image-dedup
    * primitive: decode, nearest-neighbor-sample a 9×8 grayscale grid
    * (the [[resizeImages]] index math), and set bit (row·8+col) — MSB
    * first — when the left sample is brighter than its right neighbor.
    * Near-identical images (re-encodes, small crops, brightness shifts)
    * land within a few bits of Hamming distance; [[hashHamming]] +
    * the SimHash pigeonhole banding ([[Dedup.simhashNearDup]]'s device)
    * turns the 64-bit hashes into a bucketed near-dup join at scale —
    * no pairwise pixel comparison ever runs.
    *
    * Appends `img_dhash` (long; null on null/unreadable payloads —
    * log-and-null). Grayscale is the integer mean of the color
    * channels (alpha ignored), exact on the synthetic fixtures. Same
    * per-partition decoder seam as [[imageFeatures]]. */
  def imageDHash(df: DataFrame, binCol: String,
                 decoder: ImageDecoder = JdkImageDecoder): DataFrame = {
    val out = df.schema.add("img_dhash", LongType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try Some(decoder.decode(bytes))
               catch { case _: Exception => failed += 1; None }
        decoded match {
          case None => Row.fromSeq(r.toSeq :+ null)
          case Some(d) => Row.fromSeq(r.toSeq :+ dhash64(d))
        }
      }
      logFailures(mapped, "imageDHash", () => failed)
    }(Encoders.row(out))
  }

  /** Hamming distance between two 64-bit perceptual hashes. */
  def hashHamming(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

  private def grayAt(d: DecodedImage, x: Int, y: Int): Int = {
    val base = (y * d.width + x) * d.channels
    if (d.channels == 1) d.pixels(base) & 0xff
    else ((d.pixels(base) & 0xff) + (d.pixels(base + 1) & 0xff) +
      (d.pixels(base + 2) & 0xff)) / 3
  }

  private[operators] def dhash64(d: DecodedImage): Long = {
    var h = 0L
    var y = 0
    while (y < 8) {
      val sy = y * d.height / 8
      var x = 0
      while (x < 8) {
        val sxL = x * d.width / 9
        val sxR = (x + 1) * d.width / 9
        if (grayAt(d, sxL, sy) > grayAt(d, sxR, sy))
          h |= 1L << (63 - (y * 8 + x))
        x += 1
      }
      y += 1
    }
    h
  }

  /** Resize stage: nearest-neighbor resample of each decoded image to
    * `targetW` × `targetH`, appended as a binary pixel buffer plus its
    * dimensions. The index math is the real kernel; only the decode
    * behind [[ImageDecoder]] is stubbed. Same mapPartitions seam as
    * [[imageFeatures]]: one decoder per partition, narrow op, decoded
    * pixels never cross a shuffle boundary. */
  def resizeImages(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
                   decoder: ImageDecoder = JdkImageDecoder): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val out = df.schema
      .add("resized_w", IntegerType)
      .add("resized_h", IntegerType)
      .add("resized", BinaryType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try Some(decoder.decode(bytes))
               catch { case _: Exception => failed += 1; None }
        if (decoded.isEmpty) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val d = decoded.get
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
      logFailures(mapped, "resizeImages", () => failed)
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

  case class DecodedAudio(sampleRate: Float, channels: Int, frames: Long,
                          samples: Array[Short])

  /** Audio codec seam — same per-partition contract as [[ImageDecoder]]. */
  trait AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedAudio
  }

  /** Real WAV (PCM) decode on the JDK's `javax.sound.sampled` — no external
    * dependency. Samples come out interleaved signed 16-bit: 8-bit input is
    * widened, 24/32-bit input keeps its most significant two bytes
    * (endianness-aware). Non-PCM encodings (float, a-law, …) and unreadable
    * payloads throw; [[audioFeatures]] catches and nulls (log-and-null
    * contract). */
  object JdkWavDecoder extends AudioDecoder {
    def decode(bytes: Array[Byte]): DecodedAudio = {
      import javax.sound.sampled.AudioFormat.Encoding
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val unsigned = enc == Encoding.PCM_UNSIGNED
        if (enc != Encoding.PCM_SIGNED && !unsigned)
          throw new IllegalArgumentException(s"unsupported WAV encoding $enc")
        val raw = in.readAllBytes()
        val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
        val n = raw.length / bytesPerSample
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = bytesPerSample match {
            case 1 =>
              // canonical WAV 8-bit is unsigned (recenter then widen);
              // honor a signed format declaration if one appears
              if (unsigned) (((raw(i) & 0xff) - 128) << 8).toShort
              else (raw(i) << 8).toShort
            case bps =>
              // most significant two bytes of the sample, so 24/32-bit
              // amplitudes scale into the 16-bit range instead of being
              // reinterpreted from their low bytes; an unsigned sample's
              // high byte is offset-binary -> flip its top bit to recenter
              // (0x8000-mid-scale silence must decode to 0, not full scale)
              val o = i * bps
              val (hi0, lo) =
                if (fmt.isBigEndian) (raw(o), raw(o + 1))
                else (raw(o + bps - 1), raw(o + bps - 2))
              val hi = if (unsigned) hi0 ^ 0x80 else hi0.toInt
              (((hi & 0xff) << 8) | (lo & 0xff)).toShort
          }
          i += 1
        }
        DecodedAudio(fmt.getSampleRate, fmt.getChannels, in.getFrameLength, samples)
      } finally in.close()
    }
  }

  /** Decode + feature-extract for audio payloads: sample rate, channel
    * count, frame count, duration, mean absolute amplitude. Same
    * mapPartitions seam and null contract as [[imageFeatures]]. */
  /** Delta-coded energy fingerprint — [[imageDHash]]'s audio twin (the
    * clip-dedup primitive): the sample stream splits into 65 equal
    * windows, each window's mean |amplitude| is measured, and bit w
    * (MSB first) is set when window w is LOUDER than window w+1. The
    * envelope SHAPE survives re-encoding, volume scaling and small
    * trims, so near-identical clips land within a few Hamming bits —
    * [[hashHamming]] + pigeonhole banding turns the hashes into a
    * bucketed near-dup join, the [[Dedup.simhashNearDup]] path.
    * Appends `audio_fp` (long; null on null/undecodable/too-short
    * payloads — a clip with < 65 samples has no defined envelope).
    * Window means are exact integer arithmetic (sum/ count compare via
    * cross-multiplication), so fixtures are hand-derivable. */
  def audioFingerprint(df: DataFrame, binCol: String,
                       decoder: AudioDecoder = JdkWavDecoder): DataFrame = {
    val out = df.schema.add("audio_fp", LongType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try Some(decoder.decode(bytes))
               catch { case _: Exception => failed += 1; None }
        decoded match {
          case Some(d) if d.samples.length >= 65 =>
            val n = d.samples.length
            // window w covers samples [w*n/65, (w+1)*n/65)
            val sums = new Array[Long](65)
            val cnts = new Array[Long](65)
            var w = 0
            while (w < 65) {
              // Long arithmetic: w*n overflows Int past ~33M samples
              // (~12.5 min at 44.1 kHz), which would index negative.
              val lo = (w.toLong * n / 65).toInt
              val hi = ((w + 1).toLong * n / 65).toInt
              var i = lo
              var s = 0L
              while (i < hi) { s += math.abs(d.samples(i).toLong); i += 1 }
              sums(w) = s
              cnts(w) = (hi - lo).toLong
              w += 1
            }
            var h = 0L
            var b = 0
            while (b < 64) {
              // mean(b) > mean(b+1) via cross-multiplication: exact
              if (sums(b) * cnts(b + 1) > sums(b + 1) * cnts(b))
                h |= 1L << (63 - b)
              b += 1
            }
            Row.fromSeq(r.toSeq :+ h)
          case _ => Row.fromSeq(r.toSeq :+ null)
        }
      }
      logFailures(mapped, "audioFingerprint", () => failed)
    }(Encoders.row(out))
  }

  def audioFeatures(df: DataFrame, binCol: String,
                    decoder: AudioDecoder = JdkWavDecoder): DataFrame = {
    val out = df.schema
      .add("audio_sample_rate", DoubleType)
      .add("audio_channels", IntegerType)
      .add("audio_frames", LongType)
      .add("audio_duration_sec", DoubleType)
      .add("audio_mean_abs", DoubleType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try Some(decoder.decode(bytes))
               catch { case _: Exception => failed += 1; None }
        decoded match {
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
          case Some(d) =>
            val meanAbs =
              if (d.samples.isEmpty) 0.0
              else d.samples.iterator.map(s => math.abs(s.toDouble)).sum / d.samples.length
            Row.fromSeq(r.toSeq ++ Seq[Any](
              d.sampleRate.toDouble, d.channels, d.frames,
              if (d.sampleRate > 0) d.frames / d.sampleRate.toDouble else 0.0,
              meanAbs))
        }
      }
      logFailures(mapped, "audioFeatures", () => failed)
    }(Encoders.row(out))
  }

  case class DecodedFrame(index: Int, width: Int, height: Int, mean: Double)

  /** Codec seam for multi-frame (video-like) containers. `sample` returns
    * the container's total frame count plus every `stride`-th frame's
    * features, frame 0 always included. */
  trait FrameDecoder extends Serializable {
    def sample(bytes: Array[Byte], stride: Int): (Int, Seq[DecodedFrame])
  }

  /** Real multi-frame decode on the JDK's ImageIO reader API — animated
    * GIF is the JDK-native multi-frame container (no external
    * dependency); any registered multi-image reader works the same way.
    * Frame mean is over sRGB R,G,B (alpha ignored), matching
    * [[imageFeatures]]' intensity convention. Throws on payloads no
    * reader claims; [[frameFeatures]] catches and nulls. */
  object JdkFrameDecoder extends FrameDecoder {
    def sample(bytes: Array[Byte], stride: Int): (Int, Seq[DecodedFrame]) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("no codec claims this payload")
        val reader = readers.next()
        reader.setInput(iis, false, true)
        try {
          val n = reader.getNumImages(true) // allowSearch: count by scan
          val frames = (0 until n by stride).map { i =>
            val img = reader.read(i)
            val w = img.getWidth
            val h = img.getHeight
            val argbs = img.getRGB(0, 0, w, h, null, 0, w)
            var sum = 0L
            var p = 0
            while (p < argbs.length) {
              val a = argbs(p)
              sum += ((a >> 16) & 0xff) + ((a >> 8) & 0xff) + (a & 0xff)
              p += 1
            }
            DecodedFrame(i, w, h,
              if (argbs.isEmpty) 0.0 else sum.toDouble / (argbs.length * 3L))
          }
          (n, frames)
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** Per-frame perceptual hashes — the VIDEO near-dup primitive
    * completing the modality triad ([[imageDHash]] stills,
    * [[audioFingerprint]] clips): every `stride`-th frame's dHash bits,
    * one row per sampled frame with `frame_count`/`frame_idx`/
    * `frame_dhash`. Two re-encodes of the same clip align
    * frame-by-frame within a few Hamming bits; shifted or edited clips
    * align under the best offset — sequence alignment is downstream
    * integer arithmetic over the sampled hash rows, never pixels.
    * Null/undecodable payloads keep one null-feature row (log-and-null);
    * same narrow one-reader-per-partition seam as [[frameFeatures]]. */
  def frameDHash(df: DataFrame, binCol: String, stride: Int = 1): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val out = df.schema
      .add("frame_count", IntegerType)
      .add("frame_idx", IntegerType)
      .add("frame_dhash", LongType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.flatMap { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext)
                throw new IllegalArgumentException("no codec claims this payload")
              val reader = readers.next()
              reader.setInput(iis, false, true)
              try {
                val n = reader.getNumImages(true)
                Some((n, (0 until n by stride).map { i =>
                  (i, dhash64(fromBuffered(reader.read(i))))
                }))
              } finally reader.dispose()
            } finally iis.close()
          } catch { case _: Exception => failed += 1; None }
        decoded match {
          case None => Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null)))
          case Some((count, frames)) if frames.isEmpty =>
            // A payload that decodes with 0 images still keeps one row
            // (null frame, real frame_count) — no document disappears.
            Seq(Row.fromSeq(r.toSeq ++ Seq[Any](count, null, null)))
          case Some((count, frames)) =>
            frames.map { case (i, h) =>
              Row.fromSeq(r.toSeq ++ Seq[Any](count, i, h))
            }
        }
      }
      logFailures(mapped, "frameDHash", () => failed)
    }(Encoders.row(out))
  }

  /** Frame-sampling stage: explodes each video-like payload into one row
    * per sampled frame (every `stride`-th, frame 0 included), appending
    * `frame_count`, `frame_idx`, `frame_width`, `frame_height`,
    * `frame_mean`. Null or undecodable payload keeps ONE row with null
    * features, so no document silently disappears (same log-and-null
    * contract as [[imageFeatures]]). Narrow flatMap through the same
    * one-decoder-per-partition seam; at scale the row expansion stays
    * inside the partition — decoded pixels never cross a shuffle. */
  def frameFeatures(df: DataFrame, binCol: String, stride: Int = 1,
                  decoder: FrameDecoder = JdkFrameDecoder): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val out = df.schema
      .add("frame_count", IntegerType)
      .add("frame_idx", IntegerType)
      .add("frame_width", IntegerType)
      .add("frame_height", IntegerType)
      .add("frame_mean", DoubleType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      var failed = 0L
      val mapped = rows.flatMap { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) None
          else try Some(decoder.sample(bytes, stride))
               catch { case _: Exception => failed += 1; None }
        decoded match {
          case None => Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null)))
          case Some((count, frames)) if frames.isEmpty =>
            // 0-frame decode keeps one null-frame row (real frame_count).
            Seq(Row.fromSeq(r.toSeq ++ Seq[Any](count, null, null, null, null)))
          case Some((count, frames)) =>
            frames.map(f => Row.fromSeq(r.toSeq ++
              Seq[Any](count, f.index, f.width, f.height, f.mean)))
        }
      }
      logFailures(mapped, "frameFeatures", () => failed)
    }(Encoders.row(out))
  }
}
