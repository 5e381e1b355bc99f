package graft.core

import java.util.regex.Pattern

/** XSD datatype lexical validation + facet comparison support, matching the
  * validity semantics the reference gets from `RDF::Literal#valid?`
  * (invoked at `/root/reference/lib/rdf/tabular/metadata.rb:2297`) and the
  * CSVW datatype table (`metadata.rb:52-104`).
  */
object Xsd {

  val XsdNs = "http://www.w3.org/2001/XMLSchema#"
  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val CsvwNs = "http://www.w3.org/ns/csvw#"

  /** CSVW datatype aliases (`metadata.rb:97-103`). */
  val Aliases: Map[String, String] = Map(
    "any" -> "anyAtomicType",
    "binary" -> "base64Binary",
    "datetime" -> "dateTime",
    "number" -> "double")

  /** All datatype base names the CSVW model supports (`metadata.rb:52-104`). */
  val SupportedBases: Set[String] = Set(
    "anyAtomicType", "anyURI", "base64Binary", "boolean", "byte", "date",
    "dateTime", "dateTimeStamp", "dayTimeDuration", "decimal", "double",
    "duration", "float", "gDay", "gMonth", "gMonthDay", "gYear", "gYearMonth",
    "hexBinary", "int", "integer", "language", "long", "Name", "NCName",
    "negativeInteger", "NMTOKEN", "nonNegativeInteger", "nonPositiveInteger",
    "normalizedString", "positiveInteger", "QName", "short", "string", "time",
    "token", "unsignedByte", "unsignedInt", "unsignedLong", "unsignedShort",
    "yearMonthDuration", "xml", "html", "json") ++ Aliases.keySet

  val UnsupportedBases: Set[String] = Set(
    "anyType", "anySimpleType", "ENTITIES", "IDREFS", "NMTOKENS",
    "ENTITY", "ID", "IDREF", "NOTATION")

  def canonicalBase(base: String): String = Aliases.getOrElse(base, base)

  /** Expanded datatype IRI for a base name (csvw initial-context mapping). */
  def expandedIri(base: String): String = canonicalBase(base) match {
    case "xml" => RdfNs + "XMLLiteral"
    case "html" => RdfNs + "HTML"
    case "json" => CsvwNs + "JSON"
    case b => XsdNs + b
  }

  val NumericBases: Set[String] = Set(
    "decimal", "integer", "long", "int", "short", "byte",
    "nonNegativeInteger", "positiveInteger",
    "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte",
    "nonPositiveInteger", "negativeInteger", "double", "float", "number")

  /** The integer-valued subset of [[NumericBases]] (JSON output emits these
    * as arbitrary-precision integers, the rest as doubles).
    */
  val IntegerBases: Set[String] = NumericBases -- Set("decimal", "double", "float", "number")

  val DateTimeBases: Set[String] = Set("date", "time", "dateTime", "dateTimeStamp", "datetime")
  val DurationBases: Set[String] = Set("duration", "dayTimeDuration", "yearMonthDuration")
  val BinaryBases: Set[String] = Set("hexBinary", "base64Binary", "binary")
  /** Bases that skip `\r\n\t`→space normalization (`metadata.rb:2077`). */
  val RawKeepBases: Set[String] = Set("string", "json", "xml", "html", "anyAtomicType")
  /** Bases that additionally skip whitespace collapse (`metadata.rb:2078`). */
  val NoCollapseBases: Set[String] = RawKeepBases + "normalizedString"

  private val IntegerRe = Pattern.compile("^[+-]?\\d+$")
  private val DecimalRe = Pattern.compile("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$")
  private val DoubleRe = Pattern.compile("^(?:[+-]?(?:\\d+(\\.\\d*)?|\\.\\d+)([Ee][+-]?\\d+)?|[+-]?INF|NaN)$")
  private val TzRe = "(Z|[+-]\\d{2}:\\d{2})?"
  private val DateRe = Pattern.compile(s"^-?\\d{4,}-\\d{2}-\\d{2}$TzRe$$")
  private val TimeRe = Pattern.compile(s"^\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$TzRe$$")
  private val DateTimeRe = Pattern.compile(s"^-?\\d{4,}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$TzRe$$")
  private val DateTimeStampRe = Pattern.compile(s"^-?\\d{4,}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})$$")
  private val DurationRe = Pattern.compile("^-?P(?=.)(\\d+Y)?(\\d+M)?(\\d+D)?(T(?=.)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$")
  private val DayTimeDurationRe = Pattern.compile("^-?P(?=.)(\\d+D)?(T(?=.)(\\d+H)?(\\d+M)?(\\d+(\\.\\d+)?S)?)?$")
  private val YearMonthDurationRe = Pattern.compile("^-?P(?=.)(\\d+Y)?(\\d+M)?$")
  private val HexRe = Pattern.compile("^([0-9a-fA-F]{2})*$")
  private val B64Re = Pattern.compile("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$")
  private val LanguageRe = Pattern.compile("^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")
  private val GYearRe = Pattern.compile(s"^-?\\d{4,}$TzRe$$")
  private val GMonthRe = Pattern.compile(s"^--(0[1-9]|1[0-2])$TzRe$$")
  private val GDayRe = Pattern.compile(s"^---(0[1-9]|[12]\\d|3[01])$TzRe$$")
  private val GYearMonthRe = Pattern.compile(s"^-?\\d{4,}-(0[1-9]|1[0-2])$TzRe$$")
  private val GMonthDayRe = Pattern.compile(s"^--(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])$TzRe$$")
  private val NameRe = Pattern.compile("^[A-Za-z_:][-A-Za-z0-9._:]*$")
  private val NcNameRe = Pattern.compile("^[A-Za-z_][-A-Za-z0-9._]*$")
  private val NmtokenRe = Pattern.compile("^[-A-Za-z0-9._:]+$")

  private def inRange(lex: String, lo: BigInt, hi: BigInt): Boolean =
    IntegerRe.matcher(lex).matches() && {
      val v = BigInt(lex)
      v >= lo && v <= hi
    }

  private def validDateFields(s: String): Boolean = {
    // s begins with (-)yyyy-MM-dd
    val body = if (s.startsWith("-")) s.substring(1) else s
    val yEnd = body.indexOf('-')
    if (yEnd < 0) return false
    val mo = body.substring(yEnd + 1, yEnd + 3).toInt
    val da = body.substring(yEnd + 4, yEnd + 6).toInt
    val yr = body.substring(0, yEnd).toInt
    if (mo < 1 || mo > 12 || da < 1) return false
    val leap = (yr % 4 == 0 && yr % 100 != 0) || yr % 400 == 0
    val dim = Array(31, if (leap) 29 else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    da <= dim(mo - 1)
  }

  private def validTimeFields(s: String): Boolean = {
    // hh:mm:ss anywhere at the start of s (after T already stripped)
    val hr = s.substring(0, 2).toInt
    val mi = s.substring(3, 5).toInt
    val se = s.substring(6, 8).toInt
    (hr < 24 && mi < 60 && se < 60) || (hr == 24 && mi == 0 && se == 0)
  }

  /** Lexical validity of `lex` for datatype `base` (after alias expansion). */
  def isValid(base0: String, lex: String): Boolean = {
    val base = canonicalBase(base0)
    base match {
      case "integer" => IntegerRe.matcher(lex).matches()
      case "long" => inRange(lex, BigInt(Long.MinValue), BigInt(Long.MaxValue))
      case "int" => inRange(lex, BigInt(Int.MinValue), BigInt(Int.MaxValue))
      case "short" => inRange(lex, BigInt(-32768), BigInt(32767))
      case "byte" => inRange(lex, BigInt(-128), BigInt(127))
      case "unsignedLong" => inRange(lex, BigInt(0), BigInt("18446744073709551615"))
      case "unsignedInt" => inRange(lex, BigInt(0), BigInt("4294967295"))
      case "unsignedShort" => inRange(lex, BigInt(0), BigInt(65535))
      case "unsignedByte" => inRange(lex, BigInt(0), BigInt(255))
      case "nonNegativeInteger" => IntegerRe.matcher(lex).matches() && BigInt(lex) >= 0
      case "positiveInteger" => IntegerRe.matcher(lex).matches() && BigInt(lex) > 0
      case "nonPositiveInteger" => IntegerRe.matcher(lex).matches() && BigInt(lex) <= 0
      case "negativeInteger" => IntegerRe.matcher(lex).matches() && BigInt(lex) < 0
      case "decimal" => DecimalRe.matcher(lex).matches()
      case "double" | "float" => DoubleRe.matcher(lex).matches()
      case "boolean" => lex == "true" || lex == "false" || lex == "1" || lex == "0"
      case "date" => DateRe.matcher(lex).matches() && validDateFields(lex)
      case "time" => TimeRe.matcher(lex).matches() && validTimeFields(lex)
      case "dateTime" =>
        DateTimeRe.matcher(lex).matches() && {
          val t = lex.indexOf('T')
          validDateFields(lex.substring(0, t)) && validTimeFields(lex.substring(t + 1))
        }
      case "dateTimeStamp" =>
        DateTimeStampRe.matcher(lex).matches() && {
          val t = lex.indexOf('T')
          validDateFields(lex.substring(0, t)) && validTimeFields(lex.substring(t + 1))
        }
      case "duration" => DurationRe.matcher(lex).matches()
      case "dayTimeDuration" => DayTimeDurationRe.matcher(lex).matches()
      case "yearMonthDuration" => YearMonthDurationRe.matcher(lex).matches()
      case "hexBinary" => HexRe.matcher(lex).matches()
      case "base64Binary" => B64Re.matcher(lex.replaceAll("\\s", "")).matches()
      case "language" => LanguageRe.matcher(lex).matches()
      case "gYear" => GYearRe.matcher(lex).matches()
      case "gMonth" => GMonthRe.matcher(lex).matches()
      case "gDay" => GDayRe.matcher(lex).matches()
      case "gYearMonth" => GYearMonthRe.matcher(lex).matches()
      case "gMonthDay" => GMonthDayRe.matcher(lex).matches()
      case "Name" => NameRe.matcher(lex).matches()
      case "NCName" => NcNameRe.matcher(lex).matches()
      case "NMTOKEN" => NmtokenRe.matcher(lex).matches()
      case "anyURI" | "string" | "normalizedString" | "token" | "QName" |
           "anyAtomicType" | "xml" | "html" | "json" => true
      case _ => true
    }
  }

  /** Numeric magnitude for facet comparison; INF mapped to ±max, NaN → None. */
  def numericValue(lex: String): Option[BigDecimal] = lex match {
    case "INF" | "+INF" => Some(BigDecimal("1E+10000"))
    case "-INF" => Some(BigDecimal("-1E+10000"))
    case "NaN" => None
    case s =>
      try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
  }

  /** Decoded byte length for binary facets (`metadata.rb:2250-2258`). */
  def decodedLength(base: String, lex: String): Option[Int] = canonicalBase(base) match {
    case "hexBinary" if HexRe.matcher(lex).matches() => Some(lex.length / 2)
    case "base64Binary" =>
      try Some(java.util.Base64.getMimeDecoder.decode(lex).length)
      catch { case _: IllegalArgumentException => None }
    case _ => None
  }
}
