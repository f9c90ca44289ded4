package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Unicode escapes throughout \u2014 composed vs decomposed glyphs are
  * indistinguishable in source, and that distinction is the subject. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val aDiaDecomposed = "a\u0308" // a + combining diaeresis
  private val aDiaComposed = "\u00e4"    // precomposed LATIN SMALL A WITH DIAERESIS
  private val eAcuteDecomposed = "e\u0301"
  private val eAcuteComposed = "\u00e9"

  private def norm1(s: String, form: String = "NFC"): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Normalize.unicodeNorm($"t", form).as("n"))
      .collect().head.getString(0)

  test("NFC composes decomposed sequences to precomposed codepoints") {
    val out = norm1(s"$aDiaDecomposed $eAcuteDecomposed")
    assert(out == s"$aDiaComposed $eAcuteComposed")
    assert(out.length == 3)
  }

  test("NFD decomposes precomposed codepoints") {
    assert(norm1(aDiaComposed, "NFD") == aDiaDecomposed)
  }

  test("NFKC folds compatibility forms (ligature, circled digit, fullwidth)") {
    assert(norm1("\ufb01", "NFKC") == "fi") // LATIN SMALL LIGATURE FI
    assert(norm1("\u2460", "NFKC") == "1")  // CIRCLED DIGIT ONE
    assert(norm1("\uff21", "NFKC") == "A")  // FULLWIDTH LATIN CAPITAL A
  }

  test("ASCII passes through unchanged under every form") {
    val s = "plain ascii text 123 !@#"
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach(f => assert(norm1(s, f) == s))
  }

  test("null -> null, empty -> empty") {
    val rows = Seq(Tuple1(null.asInstanceOf[String]), Tuple1("")).toDF("t")
      .select(Normalize.unicodeNorm($"t").as("n")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) == "")
  }

  test("invalid form is rejected at analysis time") {
    val e = intercept[Exception] {
      Seq(Tuple1("x")).toDF("t")
        .select(Normalize.unicodeNorm($"t", "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC"))
  }

  test("cleanText: controls stripped, whitespace collapsed, trimmed, composed") {
    val df = Seq(
      (1L, s"  ${aDiaDecomposed}bc\u0007def \t\n ok  "),
      (2L, "already clean"),
      (3L, " \u0001\u000B\u000C "),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", Normalize.cleanText($"text").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == s"${aDiaComposed}bc def ok")
    assert(out(2L) == "already clean")
    assert(out(3L) == "")
    assert(out(4L) == null)
  }

  test("cleanText lowercase form folds case after composition") {
    val out = Seq(Tuple1("A\u0308 B")).toDF("t")
      .select(Normalize.cleanText($"t", lowercase = true).as("c"))
      .collect().head.getString(0)
    assert(out == s"$aDiaComposed b")
  }

  test("property: normalization is idempotent and agrees with java.text.Normalizer") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const('\u0308'),
      Gen.const('\u00e4'), Gen.const('\ufb01'), Gen.const('\u2460'),
      Gen.const('\u3042'))).map(_.mkString)
    val cases = (0 until 300).flatMap(i => gen.apply(Gen.Parameters.default, Seed(4100L + i)))
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val jf = java.text.Normalizer.Form.valueOf(form)
      val got = cases.zipWithIndex.map { case (s, i) => (i, s) }
        .toDF("i", "t")
        .select($"i", Normalize.unicodeNorm($"t", form).as("n"),
          Normalize.unicodeNorm(Normalize.unicodeNorm($"t", form), form).as("nn"))
        .collect().map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
      cases.zipWithIndex.foreach { case (s, i) =>
        val expected = java.text.Normalizer.normalize(s, jf)
        assert(got(i)._1 == expected, s"form=$form s=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
        assert(got(i)._2 == got(i)._1, s"not idempotent: form=$form s=$s")
      }
    }
  }

  test("plan: cleanText stays narrow \u2014 no exchange, no generate") {
    val df = Seq((1L, "\u00e4 x")).toDF("doc_id", "text")
      .select(Normalize.cleanText($"text"))
    val plan = df.queryExecution.executedPlan
    val bad = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(bad.isEmpty, s"expected a narrow plan, got:\n$plan")
  }
}
