package graft

/** Shared JSON string escaping for the hand-rolled harness output
  * (Verify's oracle_sql.json, Bench's metric line). Escapes backslash,
  * quote, and ALL control chars (<0x20) — a tab or CR in authored SQL or
  * an unusual path would otherwise make the driver's json.load fail and
  * silently zero the round.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
