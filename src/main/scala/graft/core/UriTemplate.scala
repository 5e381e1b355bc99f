package graft.core

/** RFC 6570 URI Template expansion (levels 1–4 minus composite `*` on maps),
  * parsed once at plan time and applied per row.
  *
  * Covers the operator set exercised by CSVW templates in the reference test
  * corpus (`{var}`, `{+var}`, `{#var}`, `{?var}`, `{&var}`, `{.var}`, `{/var}`,
  * `{;var}`, list values, `:n` prefix and `*` explode modifiers) — cf.
  * `/root/reference/lib/rdf/tabular/metadata.rb:1963` (Addressable::Template)
  * and `/root/reference/spec/metadata_spec.rb:959-1024`.
  */
object UriTemplate {

  /** A template variable value: string, integer, or list of strings; None = undefined. */
  type Value = Any // String | Long | Int | Seq[String] | null

  sealed trait Part extends Serializable
  final case class Literal(text: String) extends Part
  final case class Expr(op: Char, vars: List[VarSpec]) extends Part
  final case class VarSpec(name: String, explode: Boolean, prefix: Int) extends Serializable

  final case class Compiled(template: String, parts: List[Part]) extends Serializable {

    def expand(values: collection.Map[String, Any]): String = {
      val sb = new StringBuilder
      parts.foreach {
        case Literal(t) => sb.append(t)
        case Expr(op, vars) =>
          val (first, sep, named, allowReserved, withName) = op match {
            case ' ' => ("", ",", false, false, false)
            case '+' => ("", ",", false, true, false)
            case '#' => ("#", ",", false, true, false)
            case '.' => (".", ".", false, false, false)
            case '/' => ("/", "/", false, false, false)
            case ';' => (";", ";", true, false, true)
            case '?' => ("?", "&", true, false, true)
            case '&' => ("&", "&", true, false, true)
            case o => throw new IllegalArgumentException(s"unsupported operator $o in $template")
          }
          val rendered = vars.flatMap { vs =>
            values.get(vs.name) match {
              case None | Some(null) => Nil
              case Some(v) =>
                val strs: Seq[String] = v match {
                  case s: Seq[_] => s.map(x => if (x == null) "" else x.toString)
                  case a: Array[_] => a.toSeq.map(x => if (x == null) "" else x.toString)
                  case other => Seq(other.toString)
                }
                if (strs.isEmpty && v.isInstanceOf[Seq[_]]) Nil
                else if (vs.explode) {
                  strs.map { s =>
                    val enc = encode(s, allowReserved)
                    if (named) s"${vs.name}=${enc}" else enc
                  }.toList match {
                    case Nil => Nil
                    case xs => List(xs.mkString(sep))
                  }
                } else {
                  val joined = strs.map { s =>
                    val cut = if (vs.prefix > 0 && !v.isInstanceOf[Seq[_]] && !v.isInstanceOf[Array[_]])
                      s.substring(0, math.min(vs.prefix, s.length)) else s
                    encode(cut, allowReserved)
                  }.mkString(",")
                  if (named) {
                    if (joined.isEmpty && (op == ';')) List(vs.name)
                    else List(s"${vs.name}=$joined")
                  } else List(joined)
                }
            }
          }
          if (rendered.nonEmpty) sb.append(first).append(rendered.mkString(sep))
      }
      sb.toString
    }
  }

  private val Unreserved = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~".toSet
  private val Reserved = ":/?#[]@!$&'()*+,;=".toSet

  /** Pct-encode per RFC 6570 §3.2.1: unreserved always kept; reserved and
    * existing pct-triplets kept only for `+`/`#` operators.
    */
  def encode(s: String, allowReserved: Boolean): String = {
    val sb = new StringBuilder
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val c = (b & 0xff).toChar
      if (Unreserved.contains(c)) { sb.append(c); i += 1 }
      else if (allowReserved && Reserved.contains(c)) { sb.append(c); i += 1 }
      else if (allowReserved && c == '%' && i + 2 < bytes.length &&
               isHex((bytes(i + 1) & 0xff).toChar) && isHex((bytes(i + 2) & 0xff).toChar)) {
        sb.append('%').append((bytes(i + 1) & 0xff).toChar).append((bytes(i + 2) & 0xff).toChar)
        i += 3
      } else { sb.append(f"%%${b & 0xff}%02X"); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char) = c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')

  def compile(template: String): Compiled = {
    val parts = List.newBuilder[Part]
    var i = 0
    val lit = new StringBuilder
    while (i < template.length) {
      val c = template(i)
      if (c == '{') {
        val close = template.indexOf('}', i)
        if (close < 0) throw new IllegalArgumentException(s"unclosed expression in $template")
        if (lit.nonEmpty) { parts += Literal(lit.toString); lit.clear() }
        var body = template.substring(i + 1, close)
        val op: Char =
          if (body.nonEmpty && "+#./;?&".contains(body.head)) { val o = body.head; body = body.tail; o }
          else ' '
        val vars = body.split(",").toList.filter(_.nonEmpty).map { spec0 =>
          var spec = spec0
          var explode = false
          var prefix = 0
          if (spec.endsWith("*")) { explode = true; spec = spec.dropRight(1) }
          val colon = spec.indexOf(':')
          if (colon >= 0) { prefix = spec.substring(colon + 1).toInt; spec = spec.substring(0, colon) }
          VarSpec(spec, explode, prefix)
        }
        parts += Expr(op, vars)
        i = close + 1
      } else { lit.append(c); i += 1 }
    }
    if (lit.nonEmpty) parts += Literal(lit.toString)
    Compiled(template, parts.result())
  }
}
