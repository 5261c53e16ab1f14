package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Golden-vector tests for the model layer (FIXTURES.md §2; reference:
  * `tests/.../test_task_opentelemetry_logging.py:34-75`,
  * `tests/test_otel_output_parser/test_utils.py:30-34`,
  * `tests/test_composable_logs/test_helpers.py:29-47`). */
class ModelSpec extends AnyFunSuite {

  test("SerializedData.encode golden vectors") {
    assert(SerializedData.encode("foo") == SerializedData("utf-8", "utf-8", "foo"))
    assert(SerializedData.encode(123) == SerializedData("int", "json", "123"))
    assert(SerializedData.encode(Array[Byte](0, 1, 2, 3, 4, 5)) ==
      SerializedData("bytes", "base64", "AAECAwQF"))
    assert(SerializedData.encode(true) == SerializedData("bool", "json", "true"))
    assert(SerializedData.encode(1.23) == SerializedData("float", "json", "1.23"))
    // Python: json.dumps({"a": 1, "b": [None, {"c": True}]})
    val nested = scala.collection.immutable.ListMap(
      "a" -> 1, "b" -> Vector(null, scala.collection.immutable.ListMap("c" -> true)))
    assert(SerializedData.encode(nested) ==
      SerializedData("json", "json", """{"a": 1, "b": [null, {"c": true}]}"""))
  }

  test("SerializedData round-trip identity incl. 256KB binary") {
    def rt(v: Any): Any = SerializedData.encode(v).decode()
    assert(rt("foo") == "foo")
    assert(rt(123) == 123L)
    assert(rt(true) == true)
    assert(rt(1.23) == 1.23)
    val big = Array.tabulate[Byte](256000)(i => (i % 256).toByte)
    assert(java.util.Arrays.equals(
      rt(big).asInstanceOf[Array[Byte]], big))
    val nested = scala.collection.immutable.ListMap(
      "a" -> 1L, "b" -> Vector(null, scala.collection.immutable.ListMap("c" -> true)))
    assert(rt(nested) == nested)
  }

  test("SerializedData rejects null and unknown combos") {
    intercept[IllegalArgumentException](SerializedData.encode(null))
    intercept[IllegalArgumentException](
      SerializedData("int", "base64", "123").decode())
  }

  test("Json parser fails cleanly on truncated/bad \\u escapes") {
    // truncated input must raise the parser's own error, not
    // StringIndexOutOfBoundsException (reachable from untrusted MLflow
    // request bodies)
    intercept[IllegalArgumentException](Json.parse("\"\\u12"))
    intercept[IllegalArgumentException](Json.parse("\"\\uzzzz\""))
    // Integer.parseInt would accept signed "hex" like -004 — must fail
    intercept[IllegalArgumentException](Json.parse("\"\\u-0041\""))
    intercept[IllegalArgumentException](Json.parse("\"\\u+041x\""))
    // Character.digit accepts non-ASCII digits (Arabic-Indic, fullwidth) —
    // RFC 8259 allows ASCII hex only
    intercept[IllegalArgumentException](Json.parse("\"\\u\u0660\u0660\u0664" + "4\""))
    intercept[IllegalArgumentException](Json.parse("\"\\u\uFF21" + "041\""))
    assert(Json.parse("\"\\u0041\"") == "A")
    assert(Json.parse("\"\\uBeeF\"") == "\uBEEF")
  }

  test("Json render/parse round-trips arbitrary nested values (property)") {
    import org.scalacheck.Gen
    val leaf: Gen[Any] = Gen.oneOf(
      Gen.long.map(l => l: Any),
      Gen.chooseNum(-1e9, 1e9).map(d => d: Any),
      Gen.asciiPrintableStr.map(s => s: Any),
      // strings exercising every escape arm incl. \u-only code points
      Gen.listOf(Gen.oneOf('"', '\\', '\n', '\t', '\r', '\b', '\f',
        'a', 'ü', '', '뻯')).map(_.mkString: Any),
      Gen.oneOf(true: Any, false: Any, null: Any))
    def tree(depth: Int): Gen[Any] =
      if (depth == 0) leaf
      else Gen.oneOf(
        leaf,
        Gen.listOfN(3, tree(depth - 1)).map(_.toVector: Any),
        Gen.listOfN(3, Gen.zip(Gen.identifier, tree(depth - 1)))
          .map(kvs => scala.collection.immutable.ListMap(kvs: _*): Any))
    val params = org.scalacheck.Gen.Parameters.default
    val seed0 = org.scalacheck.rng.Seed(20260812L)
    (0 until 200).foldLeft(seed0) { (seed, _) =>
      val v = tree(3).apply(params, seed).get
      val back = Json.parse(Json.render(v))
      assert(back == v, s"round-trip mismatch for ${Json.render(v)}")
      seed.next
    }
  }

  test("Json renders Python-style") {
    assert(Json.render(Vector(1L, 2L, 3L)) == "[1, 2, 3]")
    assert(Json.render(scala.collection.immutable.ListMap("x" -> "y")) == """{"x": "y"}""")
    assert(Json.render(1.5) == "1.5")
    assert(Json.render(2.0) == "2.0")
    assert(Json.render(null) == "null")
  }

  test("timestamp golden vectors") {
    assert(TimeFns.iso8601ToEpochMs("2022-03-19T14:47:02.118432Z") == 1647701222118L)
    assert(TimeFns.iso8601ToEpochS("2021-10-10T10:25:35.173367Z") == 1.633861535173367e9)
    assert(TimeFns.iso8601ToEpochMs("1970-01-01T00:00:00.123456Z") == 123L)
    assert(TimeFns.iso8601ToEpochUs("2021-10-10T10:25:35.173367Z") == 1633861535173367L)
  }

  test("duration rounding uses banker's rounding like Python round(x, 3)") {
    assert(TimeFns.durationRoundedS(0L, 1234567L) == 1.235)
    assert(TimeFns.durationRoundedS(0L, 1002500L) == 1.002) // 1.0025 → 1.002 (half-even)
    assert(TimeFns.durationRoundedS(0L, 1003500L) == 1.004) // 1.0035 → 1.004
  }

  test("renderSeconds duration strings") {
    assert(TimeFns.renderSeconds((0L, 1500000L)) == "1.5s")
    assert(TimeFns.renderSeconds((0L, 60000000L)) == "60.0s")
    assert(TimeFns.renderSeconds((0L, 75500000L)) == "01m 15.50s")
  }

  test("ExceptionGroup dedups by message, ordered") {
    val g = new ExceptionGroup(Seq(
      new Exception("a"), new Exception("b"), new Exception("a")))
    assert(g.exceptions.map(Errors.messageOf) == List("a", "b"))
    assert(Errors.messageOf(g) == "a-------\nb")
    val single = Errors.flattenExceptions(Seq(new Exception("x")))
    assert(!single.isInstanceOf[ExceptionGroup])
    val nested = Errors.flattenExceptions(Seq(g, new Exception("c")))
    assert(nested.asInstanceOf[ExceptionGroup].exceptions.size == 3)
  }

  test("interval intersection matches set-based oracle (1000 random cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      def r(): Intervals.Range =
        Intervals.Range(rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)
      val (r1, r2) = (r(), r())
      val s1 = (r1.start until r1.stop).toSet
      val s2 = (r2.start until r2.stop).toSet
      val got = Intervals.intersection(r1, r2)
      val gotSet = (got.start until got.stop).toSet
      assert(gotSet == (s1 & s2), s"$r1 $r2")
      assert(Intervals.intersect(r1, r2) == (s1 & s2).nonEmpty)
    }
  }

  test("AttrCodec round-trips heterogeneous values") {
    val m = Map[String, Any]("s" -> "xyz", "i" -> 1L, "f" -> 1.5, "b" -> true)
    assert(AttrCodec.parseMap(AttrCodec.renderMap(m)) == m)
    intercept[IllegalArgumentException](AttrCodec.render(null))
  }
}
