package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Spec for the §1.4 coercion rules (reference dump-es-parquet:112-183). */
class LenientSpec extends SparkSpec {

  import spark.implicits._

  private def longOf(s: String): Option[Long] =
    Seq(s).toDF("v").select(Lenient.lenientLong($"v")).as[Option[Long]].head()

  private def tsOf(s: String): Option[Timestamp] =
    Option(Seq(s).toDF("v").select(Lenient.lenientTimestamp($"v"))
      .collect().head.getTimestamp(0))

  test("lenientLong: int(v) direct parse") {
    assert(longOf("3").contains(3L))
    assert(longOf("-42").contains(-42L))
  }

  test("lenientLong: int(float(v)) fallback truncates toward zero, matching Python") {
    assert(longOf("3.7").contains(3L))   // int(float("3.7")) == 3
    assert(longOf("-3.7").contains(-3L)) // int(float("-3.7")) == -3, not -4
  }

  test("lenientLong: unparseable -> null (log-and-null, never throws)") {
    assert(longOf("x17").isEmpty)
    assert(longOf("").isEmpty)
  }

  test("lenientTimestamp: epoch heuristic boundary at 2e10 (reference :152-157)") {
    // 19_999_999_999 < 2e10 -> seconds (year 2603); one more -> millis (1970)
    val below = tsOf("19999999999").get
    val above = tsOf("20000000000").get
    assert(below.toInstant.toString.startsWith("2603-10-11"))
    assert(above.toInstant.toString.startsWith("1970-08-20"))
  }

  test("lenientTimestamp: digit-only strings are epoch, never year (fromisoformat precedence)") {
    // Python fromisoformat('2024') raises -> epoch branch: 2024 s after 1970
    assert(tsOf("2024").get.toInstant.toString == "1970-01-01T00:33:44Z")
  }

  test("lenientTimestamp: ISO-8601 strings parse; junk -> null") {
    assert(tsOf("2024-03-01T12:30:00").get.toInstant.toString == "2024-03-01T12:30:00Z")
    assert(tsOf("not a time").isEmpty)
  }

  test("lenientTimestamp: padded digit strings trim like the reader path") {
    // MapSource.timestampMicros trims before the epoch heuristic; the
    // Column path must agree on the same document
    assert(tsOf(" 1700000000 ").get.toInstant.toString == "2023-11-14T22:13:20Z")
  }

  test("coerceColumn: numeric epochs skip string round-tripping (E-notation trap)") {
    // a double epoch stringifies as 1.7000000005E9, which the digits
    // regex would miss — the numeric branch truncates and converts,
    // matching MapSource's number handling
    val out = Seq(1.7000000005e9).toDF("v")
      .select(graft.operators.Coerce.coerceColumn($"v",
        org.apache.spark.sql.types.DoubleType,
        org.apache.spark.sql.types.TimestampType).as("ts"))
      .collect().head.getTimestamp(0)
    assert(out.toInstant.toString == "2023-11-14T22:13:20Z")
  }

  test("firstOfList: first element; empty list -> null (reference :132-137)") {
    val df = Seq(Seq("a", "b"), Seq(), null).toDF("v")
      .select(Lenient.firstOfList($"v").as("f"))
    assert(df.as[Option[String]].collect().toSeq == Seq(Some("a"), None, None))
  }

  test("property: lenient coercions are total (null-or-value, never throw)") {
    // includes pathological strings: whitespace, signs, unicode, huge digits
    val gen = Gen.oneOf(
      Gen.alphaNumStr, Gen.numStr.map("-" + _),
      Gen.const("9" * 30), Gen.const("  3.5  "), Gen.const("é世"),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.choose(-1e18, 1e18).map(_.toString))
    val vs = Gen.listOfN(300, gen).pureApply(Gen.Parameters.default, Seed(42L))
    val df = vs.toDF("v").select(
      Lenient.lenientLong($"v"), Lenient.lenientDouble($"v"),
      Lenient.lenientTimestamp($"v"), Lenient.lenientString($"v"))
    assert(df.collect().length == vs.length) // must not throw
  }
}
