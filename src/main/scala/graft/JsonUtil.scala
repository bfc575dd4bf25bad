package graft

/** Shared JSON string escaping for the machine-readable artifacts
  * (Verify's oracle_sql.json, Bench's metric line). ONE escaper — the
  * driver's `json.load` parses both, and two hand-rolled copies had
  * already drifted in which control characters got named escapes.
  * Escapes quote, backslash, and ALL control chars (< 0x20): a tab or
  * CR in builder-authored SQL would otherwise corrupt the artifact and
  * silently zero a round's correctness.
  */
private[graft] object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
