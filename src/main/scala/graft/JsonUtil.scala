package graft

/** Shared minimal JSON string quoting for the contract mains' one-line
  * outputs: backslash, quote, and ALL control chars (<0x20) — a tab or
  * CR in a path or SQL string would otherwise break the driver's
  * json.load and zero the round's result.
  */
private[graft] object JsonUtil {
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
