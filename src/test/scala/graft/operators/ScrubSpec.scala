package graft.operators

import graft.SparkSpec

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii: placeholders, counts, rule order") {
    val df = Seq(
      (1L, "mail alice.smith+x@corp.example.org now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +1 202-555-0176 or (415) 555-2671"),
      (4L, "mixed bob@ex.io at 172.16.3.4 tel 555-123-4567"),
      (5L, "nothing personal here"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Scrub.scrubPii(df, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "mail <EMAIL> now")
    assert(out(2L).getString(1) == "server <IP> and <IP> up")
    assert(out(2L).getAs[Number](3).longValue == 2 &&
      out(2L).getAs[Number](2).longValue == 0)
    assert(out(3L).getString(1) == "call <PHONE> or <PHONE>")
    assert(out(4L).getString(1) == "mixed <EMAIL> at <IP> tel <PHONE>")
    assert(Seq(2, 3, 4).map(i => out(4L).getAs[Number](i).longValue) ==
      Seq(1L, 1L, 1L))
    assert(out(5L).getString(1) == "nothing personal here")
    assert(out(6L).isNullAt(1) && out(6L).isNullAt(2), "null text stays null")
  }

  test("scrubbed text is stable under re-scrubbing (idempotent)") {
    val once = Scrub.scrubPii(
      Seq((1L, "a@b.co 10.1.2.3 +1 202-555-0100")).toDF("doc_id", "text"), "text")
      .select($"doc_id", $"text")
    val twice = Scrub.scrubPii(once, "text").select($"doc_id", $"text")
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}
