package graft.expr

import graft.core.Xsd
import graft.model.ResolvedColumn

/** One evaluated cell value: canonical lexical form + whether datatype
  * conversion succeeded (`ok=false` ⇒ plain-literal fallback, matching
  * `/root/reference/lib/rdf/tabular/metadata.rb:2091-2096`).
  */
final case class CellValue(lex: String, ok: Boolean)

/** Result of the per-cell pipeline for one (column, raw string) pair. */
final case class CellResult(values: Array[CellValue], errors: Array[String], isNull: Boolean)

/** The per-cell scalar pipeline (trim → default/null → separator split →
  * datatype parse/validate → facet checks), ported semantically from the
  * reference row loop (`metadata.rb:2062-2104`) and
  * `value_matching_datatype` (`metadata.rb:2158-2302`).
  *
  * Pure, deterministic, and driven entirely by the plan-time-compiled
  * [[ResolvedColumn]] — no per-row regex compilation, no I/O. Invoked from
  * generated code via [[CsvwCellExpr]].
  */
object CellRuntime extends Serializable {

  /** Precompiled whitespace-collapse pattern: `String.replaceAll` compiles
    * its regex on EVERY call — at one call per cell that was ~6 Pattern
    * compiles per transcript row in the t1/t3/g1 hot path (round 9).
    */
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  def process(col: ResolvedColumn, raw0: String): CellResult = {
    val base = col.datatypeBase
    var value = if (raw0 == null) "" else raw0
    val errors = Array.newBuilder[String]

    // whitespace normalization (metadata.rb:2077-2078): the exact "\r\n\t"
    // sequence → space for non-raw types; then strip + collapse unless exempt
    if (!Xsd.RawKeepBases.contains(base)) value = value.replace("\r\n\t", " ")
    if (!Xsd.NoCollapseBases.contains(base))
      value = WsRun.matcher(value.trim).replaceAll(" ")
    if (value.isEmpty) value = col.default

    // an (already-defaulted) empty value splits to ZERO items — Ruby's
    // "".split(sep) is [] (metadata.rb:2082) — so a still-empty separator
    // cell is an empty sequence, not a sequence of one empty string
    val rawValues: Array[String] = col.separator match {
      case Some(sep) => splitLikeRuby(value, sep)
      case None => Array(value)
    }

    var sawNull = false
    val out = Array.newBuilder[CellValue]
    rawValues.foreach { v0 =>
      var v = v0
      if (base != "string" && base != "anyAtomicType") v = v.trim
      if (v.isEmpty) v = col.default
      if (col.nulls.contains(v)) { sawNull = true }
      else {
        val (cv, errs) = convert(col, v)
        errs.foreach(errors += _)
        out += cv
      }
    }
    val values = out.result()

    if (col.required && (values.isEmpty || values.exists(_.lex.isEmpty)))
      errors += s"Required column ${col.name} has empty value(s)"

    val isNull = col.separator.isEmpty && values.isEmpty
    CellResult(values, errors.result(), isNull)
  }

  /** Ruby String#split semantics: trailing empty strings removed. */
  private def splitLikeRuby(s: String, sep: String): Array[String] = {
    val parts = s.split(java.util.regex.Pattern.quote(sep), -1)
    var end = parts.length
    while (end > 0 && parts(end - 1).isEmpty) end -= 1
    parts.take(end)
  }

  /** `value_matching_datatype` (`metadata.rb:2158-2302`). Returns the cell
    * value (ok=false means degraded-to-plain-literal) plus errors.
    */
  private def convert(col: ResolvedColumn, v: String): (CellValue, Seq[String]) = {
    val base = col.datatypeBase
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    var lex = v
    var parsedOk = true

    if (Xsd.NumericBases.contains(base)) {
      col.numberFormat.get.parse(v) match {
        case Right(canonical) => lex = canonical
        case Left(err) => errors += err; parsedOk = false
      }
      // numericValue allocates a BigDecimal — only pay it when a range
      // facet actually needs the numeric value (round 9: unfaceted numeric
      // cells, e.g. every transcript turn_idx, skip it)
      if (parsedOk && (col.minimum.isDefined || col.maximum.isDefined ||
          col.minExclusive.isDefined || col.maxExclusive.isDefined)) {
        val num = Xsd.numericValue(lex)
        num.foreach { n =>
          col.minimum.foreach(m => if (n < BigDecimal(m)) errors += s"$lex < minimum $m")
          col.maximum.foreach(m => if (n > BigDecimal(m)) errors += s"$lex > maximum $m")
          col.minExclusive.foreach(m => if (n <= BigDecimal(m)) errors += s"$lex <= minExclusive $m")
          col.maxExclusive.foreach(m => if (n >= BigDecimal(m)) errors += s"$lex >= maxExclusive $m")
        }
      }
    } else if (base == "boolean") {
      col.booleanFormat match {
        case Some((t, f)) =>
          if (v == t) lex = "true"
          else if (v == f) lex = "false"
          else { errors += s"$v does not match boolean format"; parsedOk = false }
        case None =>
          val lower = v.toLowerCase
          if (lower == "1" || lower == "true") lex = "true"
          else if (lower == "0" || lower == "false") lex = "false"
          else { errors += s"$v does not match boolean"; parsedOk = false }
      }
    } else if (Xsd.DateTimeBases.contains(base)) {
      col.dateFormat match {
        case Some(fmt) => fmt.parse(v) match {
          case Right(canonical) => lex = canonical
          case Left(err) => errors += err; parsedOk = false
        }
        case None => // value must already be a valid XSD lexical; checked below
      }
    } else if (Xsd.DurationBases.contains(base)) {
      col.regexFormat.foreach { re =>
        if (!matchesSafely(re, v)) { errors += s"$v does not match format $re"; parsedOk = false }
      }
    } else if (Xsd.BinaryBases.contains(base)) {
      if (!Xsd.isValid(base, v)) { errors += s"$v is invalid"; parsedOk = false }
      else Xsd.decodedLength(base, v).foreach { len =>
        col.length.foreach(l => if (len != l) errors += s"decoded length $len != $l")
        col.minLength.foreach(l => if (len < l) errors += s"decoded length $len < $l")
        col.maxLength.foreach(l => if (len > l) errors += s"decoded length $len > $l")
      }
    } else {
      // other types: format is a plain regex (metadata.rb:2263-2268)
      col.regexFormat.foreach { re =>
        if (!matchesSafely(re, v)) errors += s"$v does not match format $re"
      }
    }

    // string-length facets, chars (skip binary which used decoded length)
    if (!Xsd.BinaryBases.contains(base)) {
      col.length.foreach(l => if (lex.length != l) errors += s"$lex does not have length $l")
      col.minLength.foreach(l => if (lex.length < l) errors += s"$lex does not have length >= $l")
      col.maxLength.foreach(l => if (lex.length > l) errors += s"$lex does not have length <= $l")
    }

    // generic range facets for date-ish types (numeric handled above)
    if (Xsd.DateTimeBases.contains(base) && parsedOk) {
      col.minimum.foreach(m => if (lex < m) errors += s"$lex < minimum $m")
      col.maximum.foreach(m => if (lex > m) errors += s"$lex > maximum $m")
      col.minExclusive.foreach(m => if (lex <= m) errors += s"$lex <= minExclusive $m")
      col.maxExclusive.foreach(m => if (lex >= m) errors += s"$lex >= maxExclusive $m")
    }

    // final lexical validity gate (metadata.rb:2297)
    if (parsedOk && !Xsd.isValid(base, lex)) {
      errors += s"$lex is not a valid $base"
      parsedOk = false
    }

    val anyError = errors.nonEmpty
    // any error degrades the cell to a plain literal of the *stripped input*
    // (metadata.rb:2091-2096)
    if (anyError) (CellValue(v, ok = false), errors.toSeq)
    else (CellValue(lex, ok = true), Nil)
  }

  private val regexCache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def matchesSafely(re: String, v: String): Boolean = {
    val p = regexCache.computeIfAbsent(re, r =>
      try java.util.regex.Pattern.compile(r)
      catch { case _: Exception => null })
    p == null || p.matcher(v).find()
  }
}
