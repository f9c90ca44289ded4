package graft.sinks

/** A ~60-line recursive-descent JSON reader for the snapshot log's
  * OWN sub-blocks (the per-file stats array) — the log's discipline
  * is hand-rolled JSON with no parser dependency, and the top-level
  * entry fields stay on the positional fast path in
  * [[Snapshots.parseEntry]]; this exists so a NESTED block with
  * arbitrary-depth structure parses by grammar instead of by string
  * search. Values we never write (exponent-free-ness, exotic escapes)
  * still parse; anything malformed throws, and the caller degrades to
  * "no stats" rather than guessing.
  *
  * Shapes returned: Map[String, Any] | Seq[Any] | String | Double |
  * Boolean | null. */
private[sinks] object JsonLite {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.i == s.length, s"trailing content at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def value(): Any = {
      ws()
      require(i < s.length, "unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.startsWith(word, i), s"bad literal at $i")
      i += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('['); ws()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return Seq.empty }
      val b = Seq.newBuilder[Any]
      var more = true
      while (more) {
        b += value(); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
      }
      expect(']')
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          require(i + 1 < s.length, "dangling escape")
          s.charAt(i + 1) match {
            case 'u' =>
              require(i + 5 < s.length, "short \\u escape")
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case e =>
              sb += (e match {
                case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
                case 'b' => '\b'; case 'f' => '\f'; case '/' => '/'
                case '"' => '"'; case '\\' => '\\'
                case other => throw new IllegalArgumentException(
                  s"bad escape \\$other at $i")
              })
              i += 2
          }
        } else { sb += c; i += 1 }
      }
      expect('"')
      sb.result()
    }
    private def num(): Double = {
      val start = i
      while (i < s.length && ("+-.eE".indexOf(s.charAt(i)) >= 0 ||
        s.charAt(i).isDigit)) i += 1
      require(i > start, s"expected a value at $start")
      s.substring(start, i).toDouble
    }
  }
}
