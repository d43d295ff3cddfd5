package graft

/** The one JSON string-escape used everywhere a JSON document is
  * hand-assembled (Verify's oracle_sql.json, StatusHttp error bodies):
  * backslash, quote, and ALL control chars below 0x20 — a tab or CR in
  * builder-authored SQL would otherwise break a consumer's json.load.
  * One shared implementation so an escaping fix cannot silently miss a
  * copy.
  */
private[graft] object JsonEscape {
  def apply(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
