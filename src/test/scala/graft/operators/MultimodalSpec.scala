package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def payloads = Seq("abcd", "x" * 600, null).toDF("id_str")
    .withColumn("payload", $"id_str".cast("binary"))

  test("mediaMeta: typed struct from pure column ops") {
    val r = payloads.filter($"id_str" === "abcd")
      .select(Multimodal.mediaMeta($"payload", "image/fake").as("m"))
      .select($"m.mime_type", $"m.n_bytes", $"m.digest").collect().head
    assert(r.getString(0) == "image/fake")
    assert(r.getLong(1) == 4L)
    assert(r.getString(2) == "e2fc714c4727ee9395f324cd2e7f331f") // md5("abcd")
  }

  test("imageFeatures: stub decode appends features; null payload -> null features") {
    val out = Multimodal.imageFeatures(payloads, "payload", Multimodal.StubImageDecoder).collect()
      .map(r => Option(r.get(0)).getOrElse("null").toString -> r).toMap
    val abcd = out("abcd")
    assert(abcd.getInt(2) == 64 + 4)          // img_width
    assert(abcd.getInt(3) == 64 + 28)         // img_height
    assert(abcd.getInt(4) == 3)
    assert(abcd.getDouble(5) == Seq('a', 'b', 'c', 'd').map(_.toInt).sum / 4.0)
    val nul = out("null")
    assert(nul.isNullAt(2) && nul.isNullAt(5))
  }

  test("frameSample: fixed-size frames, every n-th kept, schema grows") {
    val long = payloads.filter(length($"id_str") === 600)
    val frames = Multimodal.frameSample(long, "payload", frameBytes = 100, every = 2)
    assert(frames.columns.takeRight(2).toSeq == Seq("frame_idx", "frame"))
    val idxs = frames.select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(idxs == Seq(0, 2, 4)) // 6 frames of 100B, every 2nd
    assert(frames.select(octet_length($"frame")).as[Int].collect().forall(_ == 100))
  }

  test("resizeImages: nearest-neighbor kernel, exact buffer size, null-safe") {
    val out = Multimodal.resizeImages(payloads, "payload", targetW = 8, targetH = 4,
        decoder = Multimodal.StubImageDecoder)
      .collect().map(r => Option(r.get(0)).getOrElse("null").toString -> r).toMap
    val abcd = out("abcd")
    assert(abcd.getInt(2) == 8 && abcd.getInt(3) == 4)
    val buf = abcd.getAs[Array[Byte]](4)
    assert(buf.length == 8 * 4 * 3, "buffer must be exactly w*h*channels")
    // nearest-neighbor of pixel (0,0) channel 0 is the decoded buffer's
    // first byte ('a'); stub pixels echo the payload head
    assert(buf(0) == 'a'.toByte)
    // out-of-buffer source indices (the stub's pixels are shorter than
    // width*height*channels) fill with 0, never throw
    assert(buf.forall(b => b == 0 || "abcd".contains(b.toChar)))
    assert(out("null").isNullAt(4))
  }

  test("frameCount matches frameSample's unsampled frame total") {
    val df = payloads.filter($"id_str".isNotNull)
    val counted = df.select(sum(Multimodal.frameCount($"payload", 100))).as[Long].head()
    val sampled = Multimodal.frameSample(df, "payload", 100, 1).count()
    assert(counted == sampled && counted == 7) // 1 + 6
  }

  // --- real JDK codecs ---

  /** PNG with per-pixel control: pixel (x,y) = rgb(x*16, y*16, 255). */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 16 << 16) | (y * 16 << 8) | 255)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageDHash: near-identical images land within a few bits, distinct far") {
    import org.apache.spark.sql.functions._
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // real resize path: 90x80 images through the 9x8 sampling grid
    val base: (Int, Int) => Int = (x, y) => (x * 2 + y * 3) % 251
    val df = Seq(
      (1L, png(90, 80)(base)),
      (2L, png(90, 80)((x, y) => math.min(255, base(x, y) + 4))), // brightness nudge
      (3L, png(90, 80)((x, y) => 255 - base(x, y))),              // inverted
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("img_id", "payload")
    val h = Multimodal.imageDHash(df, "payload")
      .select($"img_id", $"img_dhash").as[(Long, Option[Long])]
      .collect().toMap
    assert(h(4L).isEmpty, "null payload -> null hash")
    val d12 = java.lang.Long.bitCount(h(1L).get ^ h(2L).get)
    val d13 = java.lang.Long.bitCount(h(1L).get ^ h(3L).get)
    assert(d12 <= 8, s"brightness nudge moved $d12 bits")
    assert(d13 >= 32, s"inversion should flip most gradient bits, moved $d13")
    // the Column-side Hamming helper agrees with the JVM computation
    val viaCol = Multimodal.imageDHash(df.filter($"img_id" <= 2), "payload")
      .agg(Multimodal.hashHamming(min($"img_dhash"), max($"img_dhash")))
      .head().getInt(0)
    assert(viaCol == d12)
  }

  test("JdkImageDecoder: real PNG round-trip recovers known pixels") {
    val d = Multimodal.JdkImageDecoder.decode(gradientPng(4, 3))
    assert(d.width == 4 && d.height == 3 && d.channels == 3)
    assert(d.pixels.length == 4 * 3 * 3)
    // pixel (2,1): R=32, G=16, B=255 at row-major interleaved offset
    val off = (1 * 4 + 2) * 3
    assert((d.pixels(off) & 0xff) == 32)
    assert((d.pixels(off + 1) & 0xff) == 16)
    assert((d.pixels(off + 2) & 0xff) == 255)
  }

  test("JdkImageDecoder: alpha PNG yields 4 channels; garbage throws") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 0x80FF0000) // half-transparent red
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.JdkImageDecoder.decode(bos.toByteArray)
    assert(d.channels == 4 && d.pixels.length == 2 * 2 * 4)
    assert((d.pixels(0) & 0xff) == 255 && (d.pixels(3) & 0xff) == 0x80)
    intercept[Exception](Multimodal.JdkImageDecoder.decode(Array[Byte](1, 2, 3)))
  }

  test("imageFeatures with the real decoder: distributed decode, mean verified") {
    val png = gradientPng(4, 4) // mean over all channels: (R̄+Ḡ+B̄)/3
    val expectedMean = {
      val rs = for (x <- 0 until 4; _ <- 0 until 4) yield x * 16
      val gs = for (_ <- 0 until 4; y <- 0 until 4) yield y * 16
      (rs.sum + gs.sum + 16 * 255).toDouble / (3 * 16)
    }
    val df = Seq((1L, png), (2L, Array[Byte](0, 1)), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload").repartition(3)
    val out = Multimodal.imageFeatures(df, "payload").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) == 4 && out(1L).getInt(3) == 4 && out(1L).getInt(4) == 3)
    assert(math.abs(out(1L).getDouble(5) - expectedMean) < 1e-9)
    assert(out(2L).isNullAt(2), "unreadable payload -> null features, row kept")
    assert(out(3L).isNullAt(2))
  }

  test("audioFingerprint: envelope shape only — volume scaling is invariant") {
    import org.apache.spark.sql.functions._
    def wav(amps: Seq[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val spw = 4
      val raw = new Array[Byte](amps.length * spw * 2)
      for (i <- 0 until amps.length * spw) {
        val a = amps(i / spw)
        raw(2 * i) = (a & 0xff).toByte
        raw(2 * i + 1) = ((a >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, (amps.length * spw).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val shape = (0 until 65).map(w => (100 + (w * 37) % 400).toShort)
    val loud = shape.map(a => (a * 2).toShort)
    val df = Seq((1L, wav(shape)), (2L, wav(loud))).toDF("id", "payload")
    val fps = Multimodal.audioFingerprint(df, "payload")
      .select($"id", $"audio_fp").as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L), "doubling the volume must not move any bit")
    assert(fps(1L) != 0L && fps(1L) != -1L, "a varied envelope sets some bits")
  }

  test("JdkWavDecoder: 24-bit PCM keeps the significant bytes, not the low ones") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 24, 1, true, false)
    val n = 100
    val raw = new Array[Byte](n * 3)
    // every sample = 0x123456 (little-endian bytes 56 34 12) ->
    // significant 16 bits = 0x1234
    var i = 0
    while (i < n) {
      raw(3 * i) = 0x56; raw(3 * i + 1) = 0x34; raw(3 * i + 2) = 0x12
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.JdkWavDecoder.decode(bos.toByteArray)
    assert(d.frames == n && d.samples.forall(_ == 0x1234),
      s"expected 0x1234 samples, got ${d.samples.take(3).map(_.toHexString).toSeq}")
  }

  test("JdkWavDecoder + audioFeatures: PCM WAV recovers rate/frames/amplitude") {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val n = 1600 // frames; stereo -> 3200 samples
    val raw = new Array[Byte](n * 4)
    var i = 0
    while (i < n * 2) { // every 16-bit sample = 1234
      raw(2 * i) = (1234 & 0xff).toByte
      raw(2 * i + 1) = ((1234 >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.JdkWavDecoder.decode(bos.toByteArray)
    assert(d.sampleRate == 16000f && d.channels == 2 && d.frames == n)
    assert(d.samples.length == n * 2 && d.samples.forall(_ == 1234))

    val df = Seq((1L, bos.toByteArray), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val out = Multimodal.audioFeatures(df, "payload").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(2) == 16000.0)
    assert(out(1L).getInt(3) == 2)
    assert(out(1L).getLong(4) == n)
    assert(out(1L).getDouble(5) == n / 16000.0)
    assert(out(1L).getDouble(6) == 1234.0)
    assert(out(2L).isNullAt(2))
  }

  /** Animated GIF of solid-gray frames over an explicit 256-gray palette
    * (exact round-trip; no quantization can move values). Geometry must
    * dodge a JDK codec quirk: small wide images (e.g. 5×4, 16×2) come
    * back with their last row zeroed; the sizes used here round-trip
    * losslessly (verified empirically). */
  private def animatedGif(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
    val ramp = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { g =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val gr = img.createGraphics()
      gr.setColor(new java.awt.Color(g, g, g))
      gr.fillRect(0, 0, w, h)
      gr.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("JdkFrameDecoder: frame count, stride sampling, exact gray means") {
    val gif = animatedGif(8, 8, Seq(10, 70, 130, 190, 250, 255, 0))
    val (n, frames) = Multimodal.JdkFrameDecoder.sample(gif, stride = 3)
    assert(n == 7)
    assert(frames.map(f => (f.index, f.width, f.height, f.mean)) ==
      Seq((0, 8, 8, 10.0), (3, 8, 8, 190.0), (6, 8, 8, 0.0)))
    val (_, all) = Multimodal.JdkFrameDecoder.sample(gif, stride = 1)
    assert(all.map(_.mean) == Seq(10.0, 70.0, 130.0, 190.0, 250.0, 255.0, 0.0))
    intercept[Exception](Multimodal.JdkFrameDecoder.sample(Array[Byte](1), 1))
  }

  test("frameFeatures: per-frame rows, null contract, distributed") {
    val df = Seq(
      (1L, animatedGif(12, 10, Seq(20, 40, 60, 80))),
      (2L, animatedGif(6, 6, Seq(200))),
      (3L, Array[Byte](9, 9)),                   // undecodable
      (4L, null.asInstanceOf[Array[Byte]]))      // null payload
      .toDF("vid_id", "payload").repartition(3)
    val rows = Multimodal.frameFeatures(df, "payload", stride = 2).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null
        else (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6))))
    val byVid = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byVid(1L) == Set((4, 0, 12, 10, 20.0), (4, 2, 12, 10, 60.0)))
    assert(byVid(2L) == Set((1, 0, 6, 6, 200.0)))
    assert(byVid(3L) == Set(null), "undecodable keeps one null-feature row")
    assert(byVid(4L) == Set(null), "null payload keeps one null-feature row")
  }
}
