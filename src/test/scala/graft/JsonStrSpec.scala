package graft

import org.scalatest.funsuite.AnyFunSuite

class JsonStrSpec extends AnyFunSuite {

  test("quote escapes quotes, backslashes, and control chars") {
    assert(JsonStr.quote("a\"b\\c\nd\te") == "\"a\\\"b\\\\c\\nd\\te\"")
    assert(JsonStr.quote("\u0001") == "\"\\u0001\"")
  }

  test("parseFlatNumberMap: ints, decimals, signed exponents") {
    val m = JsonStr.parseFlatNumberMap(
      """{"a":1,"b":-2.5,"c":1.2e-3,"d":3E+4,"e":7e2}""")
    assert(m == Map("a" -> 1.0, "b" -> -2.5, "c" -> 0.0012, "d" -> 30000.0, "e" -> 700.0))
  }

  test("parseFlatNumberMap: one malformed value never voids the map") {
    // a non-numeric value simply doesn't match; the numeric keys survive
    val m = JsonStr.parseFlatNumberMap("""{"ok":1.5,"bad":"oops","also":2}""")
    assert(m == Map("ok" -> 1.5, "also" -> 2.0))
  }

  test("parseFlatNumberMap: escaped keys and whitespace") {
    val m = JsonStr.parseFlatNumberMap("{\"k\\\"1\" : 4.25 ,\"k2\":0.001}")
    assert(m("k\\\"1") == 4.25 && m("k2") == 0.001)
  }
}
