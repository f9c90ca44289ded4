package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels behind the native text-hash expressions (SimHash32,
  * MinHashBands). Called from generated code via the object's static
  * forwarders, so one MessageDigest drives a tight loop per row instead
  * of one interpreted expression tree per token.
  *
  * Bit/byte semantics are pinned to the composable md5-hex forms in
  * [[Text]] (and therefore to the DuckDB oracle): hex digit i of the
  * digest >= '8' == the top bit of nibble i; band b compares the 8-hex-
  * char (32-bit) slice starting at 8*b, which on raw bytes is bytes
  * [4b, 4b+4) compared unsigned.
  */
object HashOps {

  private val threadMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** SimHash over token md5s — bit i = majority of nibble i's top bit. */
  def simhash32(toks: ArrayData): Long = {
    val md = threadMd.get()
    val n = toks.numElements()
    val counts = new Array[Int](32)
    var j = 0
    while (j < n) {
      if (!toks.isNullAt(j)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(j).getBytes)
        var i = 0
        while (i < 32) {
          val b = d(i >> 1)
          val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
          if (nib >= 8) counts(i) += 1
          i += 1
        }
      }
      j += 1
    }
    var r = 0L
    var i = 0
    while (i < 32) {
      if (2L * counts(i) > n) r |= (1L << i)
      i += 1
    }
    r
  }

  /** 64-bit SimHash over token md5s — bit i (0..63) is the majority vote
    * of digest bit i (bit `7 - (i & 7)` of byte `i >> 3`, i.e. the bits
    * of the first 8 digest bytes in hex-rendering order). The production
    * fingerprint width: 16-bit pigeonhole bands at Hamming budget 3 give
    * 2^16 buckets per band vs the 32-bit form's 2^8. */
  def simhash64(toks: ArrayData): Long = {
    val md = threadMd.get()
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!toks.isNullAt(j)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(j).getBytes)
        var i = 0
        while (i < 64) {
          if (((d(i >> 3) >> (7 - (i & 7))) & 1) != 0) counts(i) += 1
          i += 1
        }
      }
      j += 1
    }
    var r = 0L
    var i = 0
    while (i < 64) {
      if (2L * counts(i) > n) r |= (1L << i)
      i += 1
    }
    r
  }

  /** MinHash band signatures: word-shingles of `shingle` tokens joined by
    * a single space, md5'd once, min per band over disjoint 4-byte digest
    * slices (rendered as 8 lowercase hex chars, the composable format).
    * Bands with no shingles (short docs) are null elements. */
  def minhashBands(toks: ArrayData, shingle: Int, bands: Int): ArrayData = {
    val n = toks.numElements()
    val nsh = n - shingle + 1
    val mins = new Array[Array[Byte]](bands) // per band: winning 4-byte slice
    if (nsh > 0) {
      val md = threadMd.get()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < nsh) {
        sb.setLength(0)
        var k = 0
        while (k < shingle) {
          if (k > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + k).toString)
          k += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
        var b = 0
        while (b < bands) {
          val off = 4 * b
          if (mins(b) == null || compareUnsigned(d, off, mins(b)) < 0) {
            val slice = new Array[Byte](4)
            System.arraycopy(d, off, slice, 0, 4)
            mins(b) = slice
          }
          b += 1
        }
        i += 1
      }
    }
    val hex = "0123456789abcdef".toCharArray
    new GenericArrayData(mins.map { m =>
      if (m == null) null
      else {
        val out = new Array[Char](8)
        var i = 0
        while (i < 4) {
          out(2 * i) = hex((m(i) >> 4) & 0xf)
          out(2 * i + 1) = hex(m(i) & 0xf)
          i += 1
        }
        UTF8String.fromString(new String(out))
      }
    }.asInstanceOf[Array[Any]])
  }

  /** Weighted MinHash signatures (consistent weighted sampling over the
    * token tf bag) — ALL bands × rows draws in one call per row, with
    * the tf map built in a single O(L) pass (the HOF fold recomputes tf
    * per distinct token, O(L·D)). Semantics pinned BIT-FOR-BIT to
    * [[graft.operators.Dedup.weightedMinhashSigsFold]] and the q129
    * oracle: u = (first-8-hex-chars-of-md5("b:k|" + token) + 0.5) /
    * 2^32 (exact dyadic), v = (−StrictMath.log(u)) / tf — StrictMath
    * because Catalyst's `Log` is StrictMath.log, verified against the
    * shipped spark-catalyst bytecode — argmin by (v, token-binary),
    * draws joined "|". Returns one signature per band (1..bands order);
    * null for token-less input (the fold's filter contract). */
  def weightedMinhash(toks: ArrayData, bands: Int, rows: Int): ArrayData = {
    val n = toks.numElements()
    val tf = new java.util.LinkedHashMap[UTF8String, Integer]()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        val c = tf.get(t)
        tf.put(t, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    if (tf.isEmpty) return null
    val md = threadMd.get()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var b = 1
    while (b <= bands) {
      sb.setLength(0)
      var k = 1
      while (k <= rows) {
        val seedBytes =
          (b.toString + ":" + k.toString + "|").getBytes(StandardCharsets.UTF_8)
        var bestV = Double.PositiveInfinity
        var bestT: UTF8String = null
        val it = tf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          md.reset()
          md.update(seedBytes)
          val d = md.digest(e.getKey.getBytes)
          val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val u = (x.toDouble + 0.5) / 4294967296.0
          val v = -StrictMath.log(u) / e.getValue.doubleValue()
          if (v < bestV ||
            (v == bestV && (bestT == null || e.getKey.compareTo(bestT) < 0))) {
            bestV = v
            bestT = e.getKey
          }
        }
        if (k > 1) sb.append('|')
        sb.append(bestT.toString)
        k += 1
      }
      out(b - 1) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  private def compareUnsigned(d: Array[Byte], off: Int, min: Array[Byte]): Int = {
    var i = 0
    while (i < 4) {
      val c = (d(off + i) & 0xff) - (min(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Fused hashed char-n-gram bag of words: lowercase once, slide
    * code-point windows, md5-bucket each gram (the FeatureHash
    * construction: leading 32 digest bits unsigned, mod dim), count into
    * dim-bounded state, emit the bucket-ascending (bs, xs = cnt/total)
    * pair — the WHOLE Classifier.featureArrays(charNgrams) pipeline
    * (gram transform → explode → md5 → two groupBys → pack) as one call
    * per row with ZERO shuffles. Values are bit-identical to the
    * composable path: same lowercase (UTF8String.toLowerCase, what
    * `lower()` calls), same code-point gram slicing, same md5/conv
    * bucket arithmetic, same c/total IEEE division, same bucket-
    * ascending order (unique buckets — the composable array_sort's
    * order). Shorter-than-n texts contribute the single whole-text gram
    * (total = 1), matching Text.charNgrams' fallback. */
  def charBow(text: UTF8String, n: Int, dim: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val md = threadMd.get()
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes
    // counts: dense array for small dims (the LangId regime — 32 KB tops,
    // allocation-cheap per row), sorted map above: a 64 k-dim dense buffer
    // is 512 KB of per-row GC churn for texts that touch a few hundred
    // buckets, so large dims pay O(grams·log) instead of O(dim) memory
    val dense = dim <= (1 << 12)
    val cnts = if (dense) new Array[Long](dim) else null
    val sparse = if (dense) null else new java.util.TreeMap[Integer, java.lang.Long]()
    def bump(bucket: Int): Unit =
      if (dense) cnts(bucket) += 1
      else sparse.merge(bucket, 1L, (a, b) => a + b)
    def bucketOf(buf: Array[Byte], off: Int, len: Int): Int = {
      md.reset()
      md.update(buf, off, len)
      val d = md.digest()
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (v % dim).toInt
    }
    var total = 0L
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) {
      if (bytes.length >= n) {
        var p = 0
        while (p + n <= bytes.length) { bump(bucketOf(bytes, p, n)); total += 1; p += 1 }
      } else { bump(bucketOf(bytes, 0, bytes.length)); total = 1 }
    } else {
      // code-point windows (UTF8String.substr semantics)
      val cps = lowered.toString.codePoints().toArray
      if (cps.length >= n) {
        var p = 0
        while (p + n <= cps.length) {
          val g = new String(cps, p, n).getBytes(StandardCharsets.UTF_8)
          bump(bucketOf(g, 0, g.length)); total += 1; p += 1
        }
      } else { bump(bucketOf(bytes, 0, bytes.length)); total = 1 }
    }
    val nz =
      if (dense) { var c = 0; var b = 0; while (b < dim) { if (cnts(b) > 0) c += 1; b += 1 }; c }
      else sparse.size()
    val bs = new Array[Int](nz)
    val xs = new Array[Double](nz)
    if (dense) {
      var b = 0; var k = 0
      while (b < dim) {
        if (cnts(b) > 0) { bs(k) = b; xs(k) = cnts(b).toDouble / total.toDouble; k += 1 }
        b += 1
      }
    } else {
      val it = sparse.entrySet().iterator(); var k = 0
      while (it.hasNext) {
        val e = it.next()
        bs(k) = e.getKey; xs(k) = e.getValue.toDouble / total.toDouble; k += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(bs), new GenericArrayData(xs)))
  }
}
