package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text → token ids: hand-computed encodes, byte fallback, lossless
  * decode over the real corpus (the property that certifies the whole
  * pretokenize → merge → id pipeline drops nothing), and id-space
  * chunking. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq(("l", "o"), ("lo", "w"))

  test("hand-computed encode: merges to vocab ids, rest to bytes") {
    // pretokens: ["low", " lower", " low"]; vocab: "lo" -> 256, "low" -> 257
    val got = Tokenizer.encode(Seq((1L, "low lower low")).toDF("id", "text"),
        "text", merges)
      .select($"token_ids").as[Seq[Int]].head()
    assert(got == Seq(257, 32, 257, 101, 114, 32, 257),
      s"'low' = 257, ' ' = 32, 'e'/'r' = bytes: $got")
  }

  test("non-ASCII falls back to UTF-8 bytes, one id per byte") {
    val got = Tokenizer.encode(Seq((1L, "café")).toDF("id", "text"),
        "text", merges)
      .select($"token_ids").as[Seq[Int]].head()
    assert(got == Seq(99, 97, 102, 195, 169),
      s"U+00E9 must encode as its two UTF-8 bytes: $got")
  }

  test("null and empty text encode to zero ids") {
    val got = Tokenizer.encode(
        Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "text"),
        "text", merges)
      .select($"id", size($"token_ids")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 0))
  }

  test("encode is LOSSLESS over the real corpus: ids decode back to the text") {
    // inverse vocab: id >= 256 -> the merge string (first rank wins),
    // id < 256 -> the raw byte. Pretokens concatenate back to the exact
    // input, so decode(encode(text)) == text certifies no token is
    // dropped, duplicated, or reordered anywhere in the pipeline.
    val m = graft.queries.IncrementalOps.Merges
    val inv = new java.util.HashMap[Int, String]()
    m.zipWithIndex.foreach { case ((l, r), i) => inv.putIfAbsent(256 + i, l + r) }
    val rows = Tokenizer.encode(
        graft.Tables.load(spark, sf(), "documents"), "text", m)
      .select($"text", $"token_ids").as[(String, Seq[Int])].collect()
    assert(rows.length == 500)
    rows.foreach { case (text, ids) =>
      val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
      ids.foreach { id =>
        if (id < 256) bytes += id.toByte
        else bytes ++= inv.get(id).getBytes("UTF-8")
      }
      assert(new String(bytes.toArray, "UTF-8") == text)
    }
  }

  test("decode (the Column form): in-plan corpus round trip, multibyte " +
      "code points split across byte ids re-join, unknown ids NULL the " +
      "row, null ids stay null") {
    val m = graft.queries.IncrementalOps.Merges
    val d = graft.Tables.load(spark, sf(), "documents")
    val rt = Tokenizer.decode(Tokenizer.encode(d, "text", m),
      "token_ids", m, "rt")
    assert(rt.filter($"rt".isNull || $"rt" =!= $"text").isEmpty,
      "decode(encode(text)) must equal text on every document, in-plan")
    // multibyte split across byte-fallback ids (2-, 3-, 4-byte points)
    val uni = Tokenizer.decode(
      Tokenizer.encode(Seq((1L, "naïve café 日本語 🙂 low"))
        .toDF("id", "text"), "text", merges),
      "token_ids", merges, "rt")
    assert(uni.select($"rt").as[String].head()
      === "naïve café 日本語 🙂 low")
    // an id outside the vocab NULLs the row — never silent garbling
    val bad = Seq((1L, Seq(99, 9999)), (2L, Seq(257)), (3L, Seq.empty[Int]))
      .toDF("id", "token_ids")
    val out = Tokenizer.decode(bad, "token_ids", merges, "rt")
      .select($"id", $"rt").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty, "unknown id must null, not garble")
    assert(out(2L).contains("low") && out(3L).contains(""))
    // null ids -> null text
    val nulls = Tokenizer.decode(
      Seq((1L, null.asInstanceOf[Seq[Int]])).toDF("id", "token_ids"),
      "token_ids", merges, "rt")
    assert(nulls.select($"rt").head().isNullAt(0))
  }

  test("seeded property: 300 random-unicode strings round-trip " +
      "encode -> decode losslessly (the ASCII-only fixture can't reach " +
      "multibyte paths; this does — Latin-1, kana, CJK, emoji " +
      "surrogate pairs, mixed whitespace, empty)") {
    val rnd = new scala.util.Random(20260815L)
    val pools = Seq(
      (0x20, 0x7e),      // ASCII
      (0xa0, 0xff),      // Latin-1 accents (2-byte UTF-8)
      (0x3041, 0x3096),  // hiragana (3-byte)
      (0x4e00, 0x4fff),  // CJK (3-byte)
      (0x1f300, 0x1f64f) // emoji (4-byte, surrogate pairs in UTF-16)
    )
    val strings = (1 to 300).map { i =>
      if (i == 1) "" else {
        val sb = new java.lang.StringBuilder
        (0 until rnd.nextInt(120)).foreach { _ =>
          val (lo, hi) = pools(rnd.nextInt(pools.length))
          sb.appendCodePoint(lo + rnd.nextInt(hi - lo + 1))
        }
        sb.toString
      }
    }
    val m = graft.queries.IncrementalOps.Merges
    val df = strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val broken = Tokenizer.decode(Tokenizer.encode(df, "text", m),
        "token_ids", m, "rt")
      .filter($"rt".isNull || $"rt" =!= $"text")
    assert(broken.isEmpty,
      s"round trip must hold on arbitrary unicode: ${broken.count()} broke")
  }

  test("pretokens reconstruct the input exactly (lossless split)") {
    val d = graft.Tables.load(spark, sf(), "documents")
    val broken = d.select($"doc_id",
        array_join(Tokenizer.pretokens($"text"), "").as("re"), $"text")
      .filter($"re" =!= $"text").count()
    assert(broken == 0L)
  }

  test("splitIds: overlapping id windows, every id covered, short tail kept") {
    val df = Seq((1L, (1 to 10).toSeq), (2L, Seq.empty[Int]))
      .toDF("doc_id", "ids")
    val got = Chunk.splitIds(df, "ids", chunkTokens = 4, overlap = 1)
      .select($"doc_id", $"chunk_idx", $"chunk_ids")
      .as[(Long, Long, Seq[Int])].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, Seq(1, 2, 3, 4)),
      (1L, 1L, Seq(4, 5, 6, 7)),
      (1L, 2L, Seq(7, 8, 9, 10)),
      (1L, 3L, Seq(10))),
      s"step = 3 windows with the last start inside the doc: $got")
  }
}
