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
    val out = Multimodal.imageFeatures(payloads, "payload").collect()
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
    val out = Multimodal.resizeImages(payloads, "payload", targetW = 8, targetH = 4)
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
}
