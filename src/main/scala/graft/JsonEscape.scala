package graft

/** One JSON string-escape used by every hand-rolled JSON emitter in the
  * driver mains (Verify's oracle dump, Bench's result line). Escapes
  * backslash, quote, and ALL control chars (< 0x20) — a tab or newline
  * in builder-authored SQL or a Spark exception message would otherwise
  * corrupt the emitted document exactly when it matters. */
private[graft] object JsonEscape {
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
