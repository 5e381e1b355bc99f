package graft.core

/** RFC 3986 reference resolution + JSON-LD-style compact-IRI expansion against
  * the CSVW initial context, mirroring the reference's
  * `expand_iri(..., documentRelative: true)` (`metadata.rb:1967`).
  */
object Iri {

  /** Prefixes from the W3C CSVW initial context (`/root/reference/etc/csvw.jsonld`);
    * public vocabulary data, not code.
    */
  val Prefixes: Map[String, String] = Map(
    "as" -> "https://www.w3.org/ns/activitystreams#",
    "cc" -> "http://creativecommons.org/ns#",
    "csvw" -> "http://www.w3.org/ns/csvw#",
    "ctag" -> "http://commontag.org/ns#",
    "dc" -> "http://purl.org/dc/terms/",
    "dc11" -> "http://purl.org/dc/elements/1.1/",
    "dcat" -> "http://www.w3.org/ns/dcat#",
    "dcterms" -> "http://purl.org/dc/terms/",
    "dctypes" -> "http://purl.org/dc/dcmitype/",
    "dqv" -> "http://www.w3.org/ns/dqv#",
    "duv" -> "https://www.w3.org/TR/vocab-duv#",
    "foaf" -> "http://xmlns.com/foaf/0.1/",
    "gr" -> "http://purl.org/goodrelations/v1#",
    "grddl" -> "http://www.w3.org/2003/g/data-view#",
    "ical" -> "http://www.w3.org/2002/12/cal/icaltzd#",
    "ldp" -> "http://www.w3.org/ns/ldp#",
    "ma" -> "http://www.w3.org/ns/ma-ont#",
    "oa" -> "http://www.w3.org/ns/oa#",
    "og" -> "http://ogp.me/ns#",
    "org" -> "http://www.w3.org/ns/org#",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "prov" -> "http://www.w3.org/ns/prov#",
    "qb" -> "http://purl.org/linked-data/cube#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfa" -> "http://www.w3.org/ns/rdfa#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "rev" -> "http://purl.org/stuff/rev#",
    "rif" -> "http://www.w3.org/2007/rif#",
    "rr" -> "http://www.w3.org/ns/r2rml#",
    "schema" -> "http://schema.org/",
    "sd" -> "http://www.w3.org/ns/sparql-service-description#",
    "sioc" -> "http://rdfs.org/sioc/ns#",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "skosxl" -> "http://www.w3.org/2008/05/skos-xl#",
    "v" -> "http://rdf.data-vocabulary.org/#",
    "vcard" -> "http://www.w3.org/2006/vcard/ns#",
    "void" -> "http://rdfs.org/ns/void#",
    "wdr" -> "http://www.w3.org/2007/05/powder#",
    "wrds" -> "http://www.w3.org/2007/05/powder-s#",
    "xhv" -> "http://www.w3.org/1999/xhtml/vocab#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#")

  private lazy val byNamespace: Seq[(String, String)] =
    (Prefixes - "csvw").toSeq.sortBy { case (p, ns) => (-ns.length, p) }

  /** JSON-LD-style compaction against the CSVW initial context with
    * `vocab: true` (`reader.rb:578,585`): csvw-namespace terms compact to
    * bare names, other known namespaces to prefixed names (longest
    * namespace wins), anything else stays absolute.
    */
  def compactIri(iri: String): String = {
    val csvw = Prefixes("csvw")
    if (iri.startsWith(csvw) && iri.length > csvw.length) iri.substring(csvw.length)
    else byNamespace.collectFirst {
      case (p, ns) if iri.startsWith(ns) && iri.length > ns.length =>
        s"$p:${iri.substring(ns.length)}"
    }.getOrElse(iri)
  }

  /** True if `s` starts with a URI scheme (`scheme:`), RFC 3986 §3.1. */
  def hasScheme(s: String): Boolean = {
    if (s.isEmpty || !s.head.isLetter) return false
    var i = 1
    while (i < s.length) {
      val c = s(i)
      if (c == ':') return true
      if (!(c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return false
      i += 1
    }
    false
  }

  /** JSON-LD-ish document-relative expansion: compact IRI via the CSVW
    * context, absolute IRI kept, otherwise resolved against `base`.
    */
  def expand(base: String, ref: String): String = {
    val colon = ref.indexOf(':')
    if (colon > 0) {
      val pfx = ref.substring(0, colon)
      Prefixes.get(pfx) match {
        case Some(ns) if !ref.startsWith("//", colon + 1) => return ns + ref.substring(colon + 1)
        case _ => if (hasScheme(ref)) return ref
      }
      if (hasScheme(ref)) return ref
    }
    resolve(base, ref)
  }

  /** RFC 3986 §5 reference resolution (strict). */
  def resolve(base: String, ref: String): String = {
    if (ref.isEmpty) return base
    val r = parse(ref)
    if (r.scheme.isDefined)
      return recompose(r.copy(path = removeDotSegments(r.path)))
    val b = parse(base)
    val t =
      if (r.authority.isDefined)
        r.copy(scheme = b.scheme, path = removeDotSegments(r.path))
      else if (r.path.isEmpty) {
        val q = if (r.query.isDefined) r.query else b.query
        Uri(b.scheme, b.authority, b.path, q, r.fragment)
      } else if (r.path.startsWith("/"))
        Uri(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else {
        val merged =
          if (b.authority.isDefined && b.path.isEmpty) "/" + r.path
          else {
            val slash = b.path.lastIndexOf('/')
            if (slash >= 0) b.path.substring(0, slash + 1) + r.path else r.path
          }
        Uri(b.scheme, b.authority, removeDotSegments(merged), r.query, r.fragment)
      }
    recompose(t)
  }

  final case class Uri(scheme: Option[String], authority: Option[String],
                       path: String, query: Option[String], fragment: Option[String])

  def parse(s: String): Uri = {
    var rest = s
    var fragment: Option[String] = None
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = Some(rest.substring(hash + 1)); rest = rest.substring(0, hash) }
    var query: Option[String] = None
    val qm = rest.indexOf('?')
    if (qm >= 0) { query = Some(rest.substring(qm + 1)); rest = rest.substring(0, qm) }
    var scheme: Option[String] = None
    if (hasScheme(rest)) {
      val c = rest.indexOf(':')
      scheme = Some(rest.substring(0, c)); rest = rest.substring(c + 1)
    }
    var authority: Option[String] = None
    if (rest.startsWith("//")) {
      val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#', 2) match {
        case -1 => rest.length
        case n => n
      }
      authority = Some(rest.substring(2, end)); rest = rest.substring(end)
    }
    Uri(scheme, authority, rest, query, fragment)
  }

  def recompose(u: Uri): String = {
    val sb = new StringBuilder
    u.scheme.foreach(s => sb.append(s).append(':'))
    u.authority.foreach(a => sb.append("//").append(a))
    sb.append(u.path)
    u.query.foreach(q => sb.append('?').append(q))
    u.fragment.foreach(f => sb.append('#').append(f))
    sb.toString
  }

  /** RFC 3986 §5.2.4. */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSegment(out) }
      else if (in == "/..") { in = "/"; trimLastSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  private def trimLastSegment(sb: StringBuilder): Unit = {
    val idx = sb.lastIndexOf("/")
    sb.setLength(if (idx < 0) 0 else idx)
  }

  /** Column-title → name encoding (`metadata.rb:1629-1636`): first char
    * pct-encoded unless `[a-zA-Z0-9]`, remainder unless `[\w.]`.
    */
  def encodeColumnName(title: String): String = {
    def pct(c: Char): String =
      c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X").mkString
    title.zipWithIndex.map { case (c, i) =>
      val keep = if (i == 0) c.isLetterOrDigit && c < 128
                 else (c.isLetterOrDigit && c < 128) || c == '_' || c == '.'
      if (keep) c.toString else pct(c)
    }.mkString
  }

  /** CGI-unescape for the `_name` template variable (`metadata.rb:2121`). */
  def pctDecode(s: String): String = {
    val sb = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '%' && i + 2 < s.length + 1 && i + 2 < s.length &&
          isHex(s(i + 1)) && isHex(s(i + 2))) {
        sb.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { val bs = c.toString.getBytes("UTF-8"); sb.write(bs, 0, bs.length); i += 1 }
    }
    new String(sb.toByteArray, "UTF-8")
  }

  private def isHex(c: Char) = c.isDigit || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
}
