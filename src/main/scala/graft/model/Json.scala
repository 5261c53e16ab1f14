package graft.model

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** Minimal JSON codec with Python-`json.dumps`-compatible default rendering
  * (`", "` / `": "` separators, shortest-ish float repr). Needed because the
  * reference's SerializedData golden vectors are byte-exact dumps of Python
  * objects (`FIXTURES.md §2`, e.g. `{"a": 1, "b": [null, {"c": true}]}`), and
  * no JSON library ships in the offline dependency set.
  *
  * Scala value mapping: object → ListMap[String, Any] (insertion-ordered,
  * like Python dict), array → Vector[Any], string → String, int → Long,
  * real → Double, true/false → Boolean, null → null.
  */
object Json {

  // ---- rendering ----

  def render(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => if (b) "true" else "false"
    case i: Int => i.toString
    case l: Long => l.toString
    case f: Float => renderDouble(f.toDouble)
    case d: Double => renderDouble(d)
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => quote(k.toString) + ": " + render(x) }
        .mkString("{", ", ", "}")
    case xs: Iterable[_] => xs.map(render).mkString("[", ", ", "]")
    case xs: Array[_] => xs.map(render).mkString("[", ", ", "]")
    case other => throw new IllegalArgumentException(
      s"Not JSON-serializable: ${other.getClass.getName}")
  }

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Python-repr-style double rendering for the common range; exponent
    * notation differences (Java `1.0E20` vs Python `1e+20`) only arise
    * outside |1e-4, 1e16| which the logged-value contract never exercises. */
  def renderDouble(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == 0.0 && 1.0 / d < 0) "-0.0" // Python repr keeps the sign
    else if (d == Math.floor(d) && Math.abs(d) < 1e16) s"${d.toLong}.0"
    else {
      val s = d.toString
      if (!s.contains('E')) s
      else { // convert Java exponent form to Python's
        val Array(mant, exp) = s.split('E')
        val e = exp.toInt
        val mantClean = if (mant.endsWith(".0")) mant.dropRight(2) else mant
        val sign = if (e < 0) "-" else "+"
        val absE = Math.abs(e)
        val expStr = if (absE < 10) s"0$absE" else absE.toString
        s"${mantClean}e$sign$expStr"
      }
    }
  }

  // ---- parsing ----

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new IllegalArgumentException(
      s"Trailing content at offset ${p.pos} in JSON: $s")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && (s(pos) == ' ' || s(pos) == '\t' || s(pos) == '\n' || s(pos) == '\r'))
        pos += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")
    private def expect(c: Char): Unit = {
      if (atEnd || s(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def parseValue(): Any = {
      skipWs()
      if (atEnd) fail("unexpected end")
      s(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case 't' => parseLit("true", true)
        case 'f' => parseLit("false", false)
        case 'n' => parseLit("null", null)
        case _ => parseNumber()
      }
    }

    private def parseLit(lit: String, v: Any): Any = {
      if (!s.startsWith(lit, pos)) fail(s"expected $lit")
      pos += lit.length; v
    }

    private def parseObject(): ListMap[String, Any] = {
      expect('{'); skipWs()
      val buf = mutable.LinkedHashMap.empty[String, Any]
      if (!atEnd && s(pos) == '}') { pos += 1; return ListMap(buf.toSeq: _*) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        buf(k) = parseValue()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      ListMap(buf.toSeq: _*)
    }

    private def parseArray(): Vector[Any] = {
      expect('['); skipWs()
      val buf = Vector.newBuilder[Any]
      if (!atEnd && s(pos) == ']') { pos += 1; return buf.result() }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      buf.result()
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s(pos) != '"') {
        val c = s(pos)
        if (c == '\\') {
          pos += 1
          if (atEnd) fail("bad escape")
          s(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              if (pos + 5 > s.length) fail("bad unicode escape")
              val hex = s.substring(pos + 1, pos + 5)
              // strict ASCII hex only (RFC 8259) — Integer.parseInt would
              // also accept signed forms like "-004", and Character.digit
              // accepts non-ASCII Unicode digits/letters
              if (!hex.forall(c =>
                  (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
                    (c >= 'A' && c <= 'F')))
                fail("bad unicode escape")
              sb.append(Integer.parseInt(hex, 16).toChar)
              pos += 4
            case other => fail(s"bad escape \\$other")
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }

    private def parseNumber(): Any = {
      val start = pos
      if (!atEnd && (s(pos) == '-' || s(pos) == '+')) pos += 1
      var isDouble = false
      while (!atEnd && (s(pos).isDigit || ".eE+-".contains(s(pos)))) {
        if (s(pos) == '.' || s(pos) == 'e' || s(pos) == 'E') isDouble = true
        pos += 1
      }
      val text = s.substring(start, pos)
      if (text.isEmpty) fail("expected number")
      if (isDouble) text.toDouble else text.toLong
    }
  }
}
