package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Line-level cleaning (C4 rules) + Gopher rule flags: the two rule-based
  * curation operators added alongside the trained/LM quality scorers. */
class LineFilterSpec extends SparkSpec {

  import spark.implicits._

  test("keptLines keeps only punctuated, long-enough, unblocked lines, in order") {
    val text = Seq(
      "one two three four five.",               // keep
      "two short.",                             // < 5 words
      "no terminal punctuation on this line",   // no [.!?] ending
      "click here to enable JavaScript now.",   // blocklisted (case-folded)
      "six seven eight nine ten!",              // keep
      "\"a quoted line three four five.\""      // keep: punct inside closing quote
    ).mkString("\n")
    val out = spark.range(1)
      .select(LineFilter.keptLines(lit(text)).as("l"))
      .as[Seq[String]].head()
    assert(out == Seq(
      "one two three four five.",
      "six seven eight nine ten!",
      "\"a quoted line three four five.\""))
  }

  test("cleanDocs reassembles survivors, drops short docs and doc-blocklist hits") {
    val df = Seq(
      (1L, "aa bb cc dd ee.\nbad line\nff gg hh ii jj."),
      (2L, "aa bb cc dd ee."), // only 1 surviving line -> dropped
      (3L, "aa bb cc dd ee.\nff gg hh ii jj.\nsome Lorem Ipsum filler text here."),
      (4L, "int main() {\naa bb cc dd ee.\nff gg hh ii jj.")
    ).toDF("id", "text")
    val out = LineFilter.cleanDocs(df, "text")
      .select($"id", $"text", $"n_lines_kept").as[(Long, String, Long)]
      .collect().toSeq
    assert(out == Seq((1L, "aa bb cc dd ee.\nff gg hh ii jj.", 2L)))
  }

  test("dropBoilerplate removes high-df lines everywhere, first copy included") {
    val banner = "accept cookies"
    val df = Seq(
      (1L, s"$banner\nunique one"),
      (2L, s"$banner\nunique two\nunique three"),
      (3L, s"unique four\n$banner"),
      (4L, banner) // all-boilerplate doc -> empty rebuild
    ).toDF("id", "text")
    val out = LineFilter.dropBoilerplate(df, "text", "id", minDf = 3)
      .select($"id", $"text", $"n_lines_kept", $"n_boiler_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "unique one", 1L, 1L)))
    assert(out(2L) == ((2L, "unique two\nunique three", 2L, 1L)))
    assert(out(3L) == ((3L, "unique four", 1L, 1L)))
    assert(out(4L) == ((4L, "", 0L, 1L)))
  }

  test("gopherFlags: integer-exact signals and the combined keep verdict") {
    val df = Seq(
      // 13 words, stopwords the/the/with/a, all-alpha, no symbols -> keep
      (1L, "the quick brown fox jumps over the lazy dog with a bone today."),
      // 13 words but 10 '#' symbols -> symbol_ratio 10/13, alpha 3/13 -> fail
      (2L, "the of and " + Seq.fill(10)("#").mkString(" ")),
      // ellipsis counted as a symbol: 1 occurrence over 12 words
      (3L, "one two three four five six seven eight nine ten... the and")
    ).toDF("id", "text")
    val rows = Quality.gopherFlags(df, "text")
      .select($"id", $"n_words", $"symbol_ratio", $"alpha_frac", $"n_stop", $"keep")
      .as[(Long, Long, Double, Double, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(1L) == ((1L, 13L, 0.0, 1.0, 4L, true)))
    assert(rows(2L)._3 == 10.0 / 13 && rows(2L)._4 == 3.0 / 13 && !rows(2L)._6)
    assert(rows(3L)._2 == 12L && rows(3L)._3 == 1.0 / 12 && rows(3L)._6)
  }

  test("gopherFlags: word-count and mean-word-length bounds fire") {
    val df = Seq(
      (1L, "too few words."),                       // n_words < 10
      (2L, ("the a of " * 4) + "z" * 200)           // one 200-char word -> mean len high
    ).toDF("id", "text")
    val rows = Quality.gopherFlags(df, "text")
      .select($"id", $"mean_word_len", $"keep").as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(!rows(1L)._3)
    assert(rows(2L)._2 > 10.0 && !rows(2L)._3)
  }
}
