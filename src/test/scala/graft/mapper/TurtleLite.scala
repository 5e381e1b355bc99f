package graft.mapper

import graft.core.Iri

import scala.collection.mutable

/** Test-harness Turtle reader + blank-node-isomorphism comparer for the
  * reference golden files (`.ttl` under `/root/reference/spec/data`). Covers the
  * syntax those fixtures use: @prefix/@base, IRIs, prefixed names (incl.
  * the empty prefix), `a`, labeled (`_:x`) and anonymous (`[...]`, nested)
  * blank nodes, string literals with escapes, language tags, `^^`
  * datatypes, bare integer/decimal/double/boolean shorthand, and `;`/`,`
  * punctuation. No collections or triple-quoted strings (none appear in
  * the fixtures). Parsing happens only in tests — the engine itself never
  * reads Turtle.
  */
object TurtleLite {

  def parse(text: String, base: String = ""): Set[Triple] = new Parser(text, base).parseAll()

  private final class Parser(text: String, initialBase: String) {
    private var i = 0
    private var base = initialBase
    private val prefixes = mutable.Map.empty[String, String]
    private val out = mutable.Set.empty[Triple]
    private var anonCount = 0

    def parseAll(): Set[Triple] = {
      skipWs()
      while (i < text.length) {
        if (peekIs("@prefix")) { i += 7; parsePrefix() }
        else if (peekIs("@base")) { i += 5; skipWs(); base = parseIriRef(); skipWs(); expect('.') }
        else parseStatement()
        skipWs()
      }
      out.toSet
    }

    private def parsePrefix(): Unit = {
      skipWs()
      val pfx = readUntil(':'); expect(':')
      skipWs()
      val iri = parseIriRef()
      prefixes(pfx) = iri
      skipWs(); expect('.')
    }

    private def parseStatement(): Unit = {
      val subj = parseNode(asSubject = true)
      skipWs()
      // `[ …props… ] .` — an anonymous subject may carry its whole content
      // inside the brackets, leaving the statement's own list empty
      if (!(i < text.length && text(i) == '.')) parsePredicateObjectList(subj)
      skipWs(); expect('.')
    }

    private def parsePredicateObjectList(subj: String): Unit = {
      var more = true
      while (more) {
        skipWs()
        val pred = if (peekIs("a") && isTermEnd(i + 1)) { i += 1; graft.mapper.Vocab.RdfType }
                   else parseIri()
        var moreObjs = true
        while (moreObjs) {
          skipWs()
          parseObject(subj, pred)
          skipWs()
          if (i < text.length && text(i) == ',') { i += 1; moreObjs = true } else moreObjs = false
        }
        if (i < text.length && text(i) == ';') {
          i += 1; skipWs()
          // a ';' may be trailing before '.' or ']'
          more = i < text.length && text(i) != '.' && text(i) != ']'
        } else more = false
      }
    }

    private def parseObject(subj: String, pred: String): Unit = {
      val c = text(i)
      if (c == '"') {
        val (v, lang, dt) = parseLiteral()
        out += Triple(subj, pred, v, obj_iri = false, lang, dt)
      } else if (c == '[' || c == '_' || c == '<' || isPNameStart()) {
        if (c == '[') {
          val node = parseAnon()
          out += Triple(subj, pred, node, obj_iri = true, null, null)
        } else {
          // bare true/false keywords vs prefixed names: check word boundary
          if (peekIs("true") && isTermEnd(i + 4)) {
            i += 4
            out += Triple(subj, pred, "true", obj_iri = false, null, Xsd.Boolean)
          } else if (peekIs("false") && isTermEnd(i + 5)) {
            i += 5
            out += Triple(subj, pred, "false", obj_iri = false, null, Xsd.Boolean)
          } else {
            val o = parseNode(asSubject = false)
            out += Triple(subj, pred, o, obj_iri = true, null, null)
          }
        }
      } else if (c == '+' || c == '-' || c.isDigit) {
        val start = i
        while (i < text.length && (text(i).isDigit || "+-.eE".contains(text(i)))) i += 1
        // a trailing '.' is statement punctuation, not part of the number
        while (text(i - 1) == '.' && !text.substring(start, i).dropRight(1).contains('.')) i -= 1
        val lex = text.substring(start, i)
        val dt =
          if (lex.exists(ch => ch == 'e' || ch == 'E')) Xsd.Double
          else if (lex.contains('.')) Xsd.Decimal
          else Xsd.Integer
        out += Triple(subj, pred, lex, obj_iri = false, null, dt)
      } else sys.error(s"unexpected object at offset $i: ${text.substring(i, math.min(i + 30, text.length))}")
    }

    /** IRI, labeled bnode, or anonymous bnode. */
    private def parseNode(asSubject: Boolean): String = {
      skipWs()
      text(i) match {
        case '<' => parseIriRef()
        case '[' => parseAnon()
        case '_' =>
          i += 1; expect(':')
          "_:" + readTerm()
        case _ => parseIri()
      }
    }

    private def parseAnon(): String = {
      expect('[')
      anonCount += 1
      val node = s"_:anon$anonCount"
      skipWs()
      if (text(i) != ']') parsePredicateObjectList(node)
      skipWs(); expect(']')
      node
    }

    private def parseIri(): String = {
      skipWs()
      if (text(i) == '<') parseIriRef()
      else {
        val pfx = readUntil(':'); expect(':')
        val local = readTerm()
        val ns = prefixes.getOrElse(pfx, sys.error(s"unknown prefix '$pfx:' at $i"))
        ns + local
      }
    }

    private def parseIriRef(): String = {
      expect('<')
      val s = readUntil('>'); expect('>')
      if (s.contains("://") || base.isEmpty) s else Iri.resolve(base, s)
    }

    private def parseLiteral(): (String, String, String) = {
      expect('"')
      val sb = new StringBuilder
      while (text(i) != '"') {
        if (text(i) == '\\') {
          i += 1
          text(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case '\\' => sb += '\\'
            case '"' => sb += '"'
            case 'u' => sb += Integer.parseInt(text.substring(i + 1, i + 5), 16).toChar; i += 4
            case other => sb += other
          }
        } else sb += text(i)
        i += 1
      }
      expect('"')
      if (i < text.length && text(i) == '@') {
        i += 1
        (sb.toString, readTerm(), null)
      } else if (i + 1 < text.length && text(i) == '^' && text(i + 1) == '^') {
        i += 2
        (sb.toString, null, parseIri())
      } else (sb.toString, null, null)
    }

    // ---- lexing helpers

    private def skipWs(): Unit = {
      var go = true
      while (go && i < text.length) {
        if (text(i).isWhitespace) i += 1
        else if (text(i) == '#') { while (i < text.length && text(i) != '\n') i += 1 }
        else go = false
      }
    }
    private def peekIs(s: String): Boolean = text.startsWith(s, i)
    private def expect(c: Char): Unit = {
      if (i >= text.length || text(i) != c)
        sys.error(s"expected '$c' at offset $i: ...${text.substring(math.max(0, i - 20), math.min(i + 20, text.length))}...")
      i += 1
    }
    private def readUntil(c: Char): String = {
      val start = i
      while (i < text.length && text(i) != c) i += 1
      text.substring(start, i)
    }
    /** Term chars for bnode labels, prefixed-name locals, lang tags; a
      * trailing '.' is punctuation and is pushed back.
      */
    private def readTerm(): String = {
      val start = i
      while (i < text.length && (text(i).isLetterOrDigit ||
        "_-.%=#/".contains(text(i)))) i += 1
      while (i > start && text(i - 1) == '.') i -= 1
      text.substring(start, i)
    }
    private def isPNameStart(): Boolean = text(i).isLetter || text(i) == ':'
    private def isTermEnd(at: Int): Boolean =
      at >= text.length || !(text(at).isLetterOrDigit || "_-".contains(text(at)))
  }

  private object Xsd {
    val Ns = "http://www.w3.org/2001/XMLSchema#"
    val Integer = Ns + "integer"
    val Decimal = Ns + "decimal"
    val Double = Ns + "double"
    val Boolean = Ns + "boolean"
  }

  // ------------------------------------------------------------ isomorphism

  private def isBnode(s: String): Boolean = s.startsWith("_:")

  /** Graph equality under blank-node relabeling: ground triples compare
    * exactly; bnodes match by signature-guided backtracking (fixture graphs
    * are small and largely asymmetric, so the search is trivial in
    * practice).
    */
  def isomorphic(a: Set[Triple], b: Set[Triple]): Boolean = findMapping(a, b).isDefined

  def findMapping(a: Set[Triple], b: Set[Triple]): Option[Map[String, String]] = {
    if (a.size != b.size) return None
    val groundA = a.filter(t => !isBnode(t.subj) && !(t.obj_iri && isBnode(t.obj)))
    val groundB = b.filter(t => !isBnode(t.subj) && !(t.obj_iri && isBnode(t.obj)))
    if (groundA != groundB) return None

    def bnodes(g: Set[Triple]): Set[String] =
      g.flatMap(t => Seq(t.subj, if (t.obj_iri) t.obj else null).filter(x => x != null && isBnode(x)))
    val bnA = bnodes(a).toList
    val bnB = bnodes(b)
    if (bnA.size != bnB.size) return None

    // iterative signature refinement (3 rounds covers fixture depth)
    def signatures(g: Set[Triple]): Map[String, String] = {
      var sig = bnodes(g).map(_ -> "n").toMap
      (0 until 3).foreach { _ =>
        sig = sig.map { case (n, _) =>
          val asSubj = g.filter(_.subj == n).map(t =>
            ("S", t.pred, if (t.obj_iri && isBnode(t.obj)) sig(t.obj) else t.obj + "|" + t.lang + "|" + t.dtype))
          val asObj = g.filter(t => t.obj_iri && t.obj == n).map(t =>
            ("O", t.pred, if (isBnode(t.subj)) sig(t.subj) else t.subj))
          n -> (asSubj ++ asObj).toList.sorted.mkString(";")
        }
      }
      sig
    }
    val sigA = signatures(a)
    val sigB = signatures(b)
    val byClassB = bnB.groupBy(sigB)

    // quick reject: class multisets must align
    if (sigA.values.toList.sorted != sigB.values.toList.sorted) return None

    // order: most-constrained first
    val ordered = bnA.sortBy(n => byClassB.getOrElse(sigA(n), Set.empty).size)
    def applyMap(m: Map[String, String], t: Triple): Triple = t.copy(
      subj = m.getOrElse(t.subj, t.subj),
      obj = if (t.obj_iri) m.getOrElse(t.obj, t.obj) else t.obj)

    def search(rest: List[String], used: Set[String],
               acc: Map[String, String]): Option[Map[String, String]] = rest match {
      case Nil =>
        if (a.map(applyMap(acc, _)) == b) Some(acc) else None
      case n :: tail =>
        val cands = byClassB.getOrElse(sigA(n), Set.empty) -- used
        cands.iterator
          .map(c => search(tail, used + c, acc + (n -> c)))
          .collectFirst { case Some(m) => m }
    }
    search(ordered, Set.empty, Map.empty)
  }

  /** Human-readable diff for assertion messages: ground mismatches plus
    * per-signature class count mismatches.
    */
  def diff(a: Set[Triple], b: Set[Triple]): String = {
    val groundA = a.filter(t => !isBnode(t.subj) && !(t.obj_iri && isBnode(t.obj)))
    val groundB = b.filter(t => !isBnode(t.subj) && !(t.obj_iri && isBnode(t.obj)))
    val bnodeA = a -- groundA
    val bnodeB = b -- groundB
    s"""sizes: got ${a.size} vs want ${b.size}
       |ground extra (got-want): ${(groundA -- groundB).toList.sortBy(_.toString).take(12).mkString("\n  ", "\n  ", "")}
       |ground missing (want-got): ${(groundB -- groundA).toList.sortBy(_.toString).take(12).mkString("\n  ", "\n  ", "")}
       |bnode-involving: got ${bnodeA.size} vs want ${bnodeB.size}
       |got sample: ${bnodeA.toList.sortBy(_.toString).take(12).mkString("\n  ", "\n  ", "")}
       |want sample: ${bnodeB.toList.sortBy(_.toString).take(12).mkString("\n  ", "\n  ", "")}""".stripMargin
  }
}
