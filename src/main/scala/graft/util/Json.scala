package graft.util

/** Minimal dependency-free JSON rendering (manifest, bench output).
  * Escapes quotes, backslashes and all control chars.
  */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  def render(v: Any): String = v match {
    case null               => "null"
    case s: String          => str(s)
    case b: Boolean         => b.toString
    case d: Double          => if (d.isNaN || d.isInfinite) str(d.toString) else d.toString
    case n: Number          => n.toString
    case m: Map[_, _] =>
      m.map { case (k, x) => s"${str(k.toString)}: ${render(x)}" }
        .mkString("{", ", ", "}")
    case xs: Iterable[_]    => xs.map(render).mkString("[", ", ", "]")
    case other              => str(other.toString)
  }
}
