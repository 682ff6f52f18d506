package graft.util

/** Minimal JSON string escaping, shared by the dev mains (Verify's
  * oracle_sql.json, ScaleCurve's metric line). One implementation so an
  * escaping fix propagates to every emitted artifact. */
object Json {
  /** `s` rendered as a JSON string literal: backslash, quote, and ALL
    * control chars (<0x20) escaped — a tab or CR in builder-authored
    * SQL must not make a downstream json.load fail. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
