package graft.sources.warc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, IOException}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the honest multi-member gzip decoder: for
  * arbitrary member contents and counts the decoded stream must equal
  * the concatenation bit-for-bit; every truncation point that is NOT a
  * member boundary must error (a boundary cut IS a valid shorter
  * archive — the one legitimate clean EOF); appended garbage errors
  * while an appended valid member reads through; trailer corruption
  * errors. Seeded batches, so failures reproduce. */
class GzipMembersPropertySpec extends SparkSpec {

  private def gzip(m: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(m); gz.finish(); gz.close()
    out.toByteArray
  }

  private val memberGen: Gen[Array[Byte]] = for {
    n <- Gen.frequency(3 -> Gen.choose(0, 64), 2 -> Gen.choose(65, 4096),
      1 -> Gen.choose(4097, 100000))
    style <- Gen.oneOf("runs", "noise") // compressible and incompressible
    seedByte <- Gen.choose(0, 255)
  } yield {
    val a = new Array[Byte](n)
    var i = 0
    var x = seedByte
    while (i < n) {
      x = if (style == "runs") (if (i % 97 == 0) x + 1 else x)
          else x * 31 + i + 1
      a(i) = (x & 0xff).toByte
      i += 1
    }
    a
  }

  private val archiveGen: Gen[Seq[Array[Byte]]] =
    Gen.choose(0, 8).flatMap(k => Gen.listOfN(k, memberGen))

  private def decode(bytes: Array[Byte]): Array[Byte] = {
    val in = new GzipMembersStream(new ByteArrayInputStream(bytes), "prop.gz")
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](257) // odd size: exercises partial reads
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def cases(seedStr: String, n: Int): Seq[Seq[Array[Byte]]] =
    (0 until n).flatMap(i => archiveGen.apply(Gen.Parameters.default,
      Seed(seedStr.hashCode.toLong * 1000003L + i)))

  test("decoded stream == concatenated members, any member count/content") {
    cases("roundtrip", 40).foreach { members =>
      val bytes = members.map(gzip).foldLeft(Array.emptyByteArray)(_ ++ _)
      val got = decode(bytes)
      val want = members.foldLeft(Array.emptyByteArray)(_ ++ _)
      assert(java.util.Arrays.equals(got, want),
        s"round-trip mismatch at ${members.map(_.length).mkString(",")}")
    }
  }

  test("every NON-boundary truncation point errors; boundary cuts are " +
      "the one legitimate clean EOF") {
    cases("truncate", 12).foreach { members =>
      val encoded = members.map(gzip)
      val bytes = encoded.foldLeft(Array.emptyByteArray)(_ ++ _)
      val boundaries = encoded.scanLeft(0)(_ + _.length).toSet
      if (bytes.nonEmpty) {
        val cuts = Seq(1, 7, bytes.length / 3, bytes.length / 2,
          bytes.length - 9, bytes.length - 1)
          .filter(c => c >= 1 && c < bytes.length).distinct
        cuts.foreach { c =>
          val cut = java.util.Arrays.copyOfRange(bytes, 0, c)
          if (boundaries(c)) {
            // a cut ON a member boundary is a valid shorter archive
            val keep = encoded.scanLeft(0)(_ + _.length).indexOf(c)
            assert(java.util.Arrays.equals(decode(cut),
              members.take(keep).foldLeft(Array.emptyByteArray)(_ ++ _)))
          } else {
            val e = intercept[IOException](decode(cut))
            assert(e.getMessage.contains("prop.gz"),
              s"cut at $c/${bytes.length} must name the file, got $e")
          }
        }
      }
    }
  }

  test("appended garbage errors; an appended VALID member reads through " +
      "(the distinguishing pair)") {
    cases("garbage", 12).foreach { members =>
      val bytes = members.map(gzip).foldLeft(Array.emptyByteArray)(_ ++ _)
      val garbage = "definitely not a gzip header".getBytes("ISO-8859-1")
      val e = intercept[IOException](decode(bytes ++ garbage))
      assert(e.getMessage.contains("prop.gz"))
      val tail = "tail member".getBytes("ISO-8859-1")
      val got = decode(bytes ++ gzip(tail))
      val want = members.foldLeft(Array.emptyByteArray)(_ ++ _) ++ tail
      assert(java.util.Arrays.equals(got, want))
    }
    // empty input is clean EOF (zero members, zero bytes)
    assert(decode(Array.emptyByteArray).isEmpty)
  }

  test("trailer corruption (CRC and ISIZE fields) always errors — " +
      "corrupt bytes never ship") {
    cases("flip", 12).foreach { members =>
      if (members.nonEmpty) {
        val bytes = members.map(gzip).foldLeft(Array.emptyByteArray)(_ ++ _)
        // the last 8 bytes are the final member's CRC32 + ISIZE — both
        // verified on every path (ignored header fields like MTIME are
        // deliberately NOT flipped here: tolerating those is correct)
        Seq(bytes.length - 2, bytes.length - 6).foreach { p =>
          val mut = bytes.clone()
          mut(p) = (mut(p) ^ 0x20).toByte
          val e = intercept[IOException](decode(mut))
          assert(e.getMessage.contains("prop.gz"), s"flip at $p: $e")
        }
      }
    }
  }

  test("truncation inside a header field errors with the file named") {
    Seq(Array[Byte](0x1f.toByte), Array[Byte](0x1f.toByte, 0x8b.toByte, 8),
      Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
      .foreach { b =>
        val e = intercept[EOFException](decode(b))
        assert(e.getMessage.contains("prop.gz"))
      }
  }
}
