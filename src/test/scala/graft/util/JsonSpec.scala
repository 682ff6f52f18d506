package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate json.load-s oracle_sql.json; a single
  * unescaped control char in builder-authored SQL would zero the whole
  * round. Pin the escaper against the JSON grammar. */
class JsonSpec extends AnyFunSuite {

  test("plain strings round-trip unchanged inside quotes") {
    assert(Json.quote("SELECT 1 AS x") == "\"SELECT 1 AS x\"")
  }

  test("quotes and backslashes are escaped") {
    assert(Json.quote("""a"b\c""") == """"a\"b\\c"""")
  }

  test("common whitespace controls use the short escapes") {
    assert(Json.quote("a\nb\rc\td") == "\"a\\nb\\rc\\td\"")
  }

  test("remaining control chars use \\u escapes") {
    val s = "a" + 0.toChar + "b" + 31.toChar + "c"
    assert(Json.quote(s) == "\"a\\u0000b\\u001fc\"")
  }

  test("every escaped string parses back to the original (JSON grammar check)") {
    // exhaustive over the chars the escaper special-cases, plus samples
    val cases = Seq(
      "", "plain", "with \"quotes\" and \\slashes\\",
      (0 until 32).map(_.toChar).mkString,
      "multi\nline\tsql -- comment\r\n",
      "unicode: é π 你好")
    cases.foreach { s =>
      val parsed = org.json4s.jackson.JsonMethods.parse(
        s"""{"k": ${Json.quote(s)}}""")
      val back = (parsed \ "k") match {
        case org.json4s.JString(v) => v
        case other => fail(s"unexpected: $other")
      }
      assert(back == s, s"round-trip failed for ${s.take(20)}")
    }
  }
}
