package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

/** The snapshot log's nested-block reader: exact shapes for everything
  * the log writes, grammar-level rejection for everything malformed
  * (the caller treats a throw as "no stats", never a wrong bound). */
class JsonLiteSpec extends AnyFunSuite {

  test("parses the log's own stats shapes exactly") {
    val v = JsonLite.parse(
      """[{"#":100,"id":{"n":[1.0,2.5],"z":0},"key":{"s":["YQ==","Yg=="]}},{}]""")
    val arr = v.asInstanceOf[Seq[Any]]
    assert(arr.size == 2)
    val m = arr.head.asInstanceOf[Map[String, Any]]
    assert(m("#") == 100.0)
    val id = m("id").asInstanceOf[Map[String, Any]]
    assert(id("n") == Seq(1.0, 2.5) && id("z") == 0.0)
    assert(arr(1).asInstanceOf[Map[String, Any]].isEmpty)
  }

  test("full JSON value coverage: nesting, escapes, literals, numbers") {
    assert(JsonLite.parse("null") == null)
    assert(JsonLite.parse("true") == true)
    assert(JsonLite.parse("-1.5e3") == -1500.0)
    assert(JsonLite.parse("\"a\\n\\\"b\\u0041\"") == "a\n\"bA")
    assert(JsonLite.parse("""{"a":[{"b":[]}],"c":{}}""") ==
      Map("a" -> Seq(Map("b" -> Seq.empty)), "c" -> Map.empty))
    assert(JsonLite.parse(" [ 1 , 2 ] ") == Seq(1.0, 2.0))
  }

  test("malformed input throws (the caller's degrade-to-no-stats door)") {
    Seq("{", "[1,", """{"a"}""", """{"a":}""", "[1 2]", "tru", "",
      """{"a":1}x""", "\"unterminated").foreach { bad =>
      assertThrows[Exception](JsonLite.parse(bad))
    }
  }
}
