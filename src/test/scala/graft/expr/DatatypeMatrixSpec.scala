package graft.expr

import graft.model.{CsvwJson, Resolve, ResolvedColumn}
import org.scalatest.funsuite.AnyFunSuite

/** Second table-driven batch lifted from the reference datatype matrix
  * (`/root/reference/spec/metadata_spec.rb:1173-1479`): the input/expected
  * pairs, run through the plan-compiled cell pipeline.
  */
class DatatypeMatrixSpec extends AnyFunSuite {

  final case class Case(base: String, value: String,
                        format: Option[String] = None,
                        groupChar: Option[String] = None,
                        decimalChar: Option[String] = None,
                        length: Option[Int] = None,
                        minLength: Option[Int] = None,
                        maxLength: Option[Int] = None,
                        expect: Option[String] = None, // canonical lexical when ok
                        isError: Boolean = false)

  def columnFor(c: Case): ResolvedColumn = {
    val fmt = (c.format, c.groupChar, c.decimalChar) match {
      case (None, None, None) => ""
      case (Some(p), None, None) => s""","format":"${p.replace("\\", "\\\\")}""""
      case _ =>
        val fields = List(
          c.format.map(p => s""""pattern":"$p""""),
          c.groupChar.map(g => s""""groupChar":"$g""""),
          c.decimalChar.map(d => s""""decimalChar":"$d"""")).flatten.mkString(",")
        s""","format":{$fields}"""
    }
    val facets = List(
      c.length.map(l => s""","length":$l"""),
      c.minLength.map(l => s""","minLength":$l"""),
      c.maxLength.map(l => s""","maxLength":$l""")).flatten.mkString
    val json = s"""{"url":"http://e/t","tableSchema":{"columns":[
      {"name":"v","datatype":{"base":"${c.base}"$fmt$facets}}]}}"""
    Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
  }

  val cases: Seq[(String, Case)] = Seq(
    "string length ok" -> Case("string", "foo", length = Some(3), expect = Some("foo")),
    "string wrong length" -> Case("string", "foo", length = Some(4), isError = true),
    "string wrong maxLength" -> Case("string", "foo", maxLength = Some(2), isError = true),
    "string wrong minLength" -> Case("string", "foo", minLength = Some(4), isError = true),
    "decimal no constraints" -> Case("decimal", "4", expect = Some("4")),
    "decimal pattern 000" -> Case("decimal", "123", format = Some("000"), expect = Some("123")),
    "decimal groupChar" -> Case("decimal", "123;456.789", groupChar = Some(";"), expect = Some("123456.789")),
    "decimal repeated groupChar" -> Case("decimal", "123;;456.789", groupChar = Some(";"), isError = true),
    "decimal decimalChar" -> Case("decimal", "123456;789", decimalChar = Some(";"), expect = Some("123456.789")),
    "invalid decimal exponent" -> Case("decimal", "123456.789e10", isError = true),
    "decimal percent" -> Case("decimal", "123456.789%", groupChar = Some(","), expect = Some("1234.56789")),
    "decimal per-mille" -> Case("decimal", "123456.789‰", groupChar = Some(","), expect = Some("123.456789")),
    "valid integer" -> Case("integer", "1234", expect = Some("1234")),
    "invalid integer" -> Case("integer", "1234.56", isError = true),
    "valid long" -> Case("long", "1234", expect = Some("1234")),
    "invalid long" -> Case("long", "1234.56", isError = true),
    "valid short" -> Case("short", "1234", expect = Some("1234")),
    "invalid short big" -> Case("short", "1234567", isError = true),
    "valid byte" -> Case("byte", "123", expect = Some("123")),
    "invalid byte" -> Case("byte", "1234", isError = true),
    "valid unsignedLong" -> Case("unsignedLong", "1234", expect = Some("1234")),
    "invalid unsignedLong" -> Case("unsignedLong", "-1234", isError = true),
    "valid unsignedShort" -> Case("unsignedShort", "1234", expect = Some("1234")),
    "invalid unsignedShort" -> Case("unsignedShort", "-1234", isError = true),
    "valid unsignedByte" -> Case("unsignedByte", "123", expect = Some("123")),
    "invalid unsignedByte" -> Case("unsignedByte", "-123", isError = true),
    "valid positiveInteger" -> Case("positiveInteger", "123", expect = Some("123")),
    "invalid positiveInteger" -> Case("positiveInteger", "-123", isError = true),
    "valid negativeInteger" -> Case("negativeInteger", "-123", expect = Some("-123")),
    "invalid negativeInteger" -> Case("negativeInteger", "123", isError = true),
    "valid nonPositiveInteger" -> Case("nonPositiveInteger", "0", expect = Some("0")),
    "invalid nonPositiveInteger" -> Case("nonPositiveInteger", "1", isError = true),
    "valid nonNegativeInteger" -> Case("nonNegativeInteger", "0", expect = Some("0")),
    "invalid nonNegativeInteger" -> Case("nonNegativeInteger", "-1", isError = true),
    "valid double exp" -> Case("double", "1234.456e789", expect = Some("1234.456e789")),
    "invalid double" -> Case("double", "1z", isError = true),
    "NaN double" -> Case("double", "NaN", expect = Some("NaN")),
    "INF double" -> Case("double", "INF", expect = Some("INF")),
    "-INF double" -> Case("double", "-INF", expect = Some("-INF")),
    "number alias" -> Case("number", "1234.456e789", expect = Some("1234.456e789")),
    "valid float" -> Case("float", "1234.456e7", expect = Some("1234.456e7")),
    "boolean true" -> Case("boolean", "true", expect = Some("true")),
    "boolean 1" -> Case("boolean", "1", expect = Some("true")),
    "boolean 0" -> Case("boolean", "0", expect = Some("false")),
    "boolean Y" -> Case("boolean", "Y", format = Some("Y|N"), expect = Some("true")),
    "boolean N" -> Case("boolean", "N", format = Some("Y|N"), expect = Some("false")),
    // dates / times / datetimes (formats covered exhaustively in Uax35Spec;
    // here the integration through the cell pipeline)
    "date fmt" -> Case("date", "22.3.2015", format = Some("d.M.yyyy"), expect = Some("2015-03-22")),
    "time fmt" -> Case("time", "150237", format = Some("HHmmss"), expect = Some("15:02:37")),
    "dateTime fmt" -> Case("dateTime", "20150315 150237", format = Some("yyyyMMdd HHmmss"),
      expect = Some("2015-03-15T15:02:37")),
    "dateTimeStamp tz" -> Case("dateTimeStamp", "15-3-2015 1502 Z", format = Some("d-M-yyyy HHmm X"),
      expect = Some("2015-03-15T15:02:00Z")),
    "datetime alias fmt" -> Case("datetime", "2015-03-15T15:02", format = Some("yyyy-MM-ddTHH:mm"),
      expect = Some("2015-03-15T15:02:00")),
    "time tz X" -> Case("time", "15:02:37-05", format = Some("HH:mm:ssX"), expect = Some("15:02:37-05:00")),
    "invalid time tz X" -> Case("time", "15:02:37-05:00", format = Some("HH:mm:ssX"), isError = true),
    // g-types
    "valid gDay" -> Case("gDay", "---31", expect = Some("---31")),
    "valid gMonth" -> Case("gMonth", "--02", expect = Some("--02")),
    "valid gMonthDay" -> Case("gMonthDay", "--02-21", expect = Some("--02-21")),
    "valid gYear" -> Case("gYear", "9999", expect = Some("9999")),
    "valid gYearMonth" -> Case("gYearMonth", "1999-05", expect = Some("1999-05")),
    // durations
    "duration PT130S" -> Case("duration", "PT130S", expect = Some("PT130S")),
    "duration PT130M" -> Case("duration", "PT130M", expect = Some("PT130M")),
    "duration PT130H" -> Case("duration", "PT130H", expect = Some("PT130H")),
    "duration P130D" -> Case("duration", "P130D", expect = Some("P130D")),
    "duration P130M" -> Case("duration", "P130M", expect = Some("P130M")),
    "duration P130Y" -> Case("duration", "P130Y", expect = Some("P130Y")),
    "duration PT2M10S" -> Case("duration", "PT2M10S", expect = Some("PT2M10S")),
    "duration P0Y20M0D" -> Case("duration", "P0Y20M0D", expect = Some("P0Y20M0D")),
    "duration -P60D" -> Case("duration", "-P60D", expect = Some("-P60D")),
    "dayTimeDuration" -> Case("dayTimeDuration", "P1DT2H", expect = Some("P1DT2H")),
    "yearMonthDuration" -> Case("yearMonthDuration", "P0Y20M", expect = Some("P0Y20M")),
    // binary with decoded-length facets
    "base64 ok" -> Case("base64Binary",
      "Tm93IGlzIHRoZSB0aW1lIGZvciBhbGwgZ29vZCBjb2RlcnMKdG8gbGVhcm4g",
      expect = Some("Tm93IGlzIHRoZSB0aW1lIGZvciBhbGwgZ29vZCBjb2RlcnMKdG8gbGVhcm4g")),
    "base64 length 45" -> Case("base64Binary",
      "Tm93IGlzIHRoZSB0aW1lIGZvciBhbGwgZ29vZCBjb2RlcnMKdG8gbGVhcm4g",
      length = Some(45),
      expect = Some("Tm93IGlzIHRoZSB0aW1lIGZvciBhbGwgZ29vZCBjb2RlcnMKdG8gbGVhcm4g")),
    "base64 wrong maxLength" -> Case("base64Binary",
      "Tm93IGlzIHRoZSB0aW1lIGZvciBhbGwgZ29vZCBjb2RlcnMKdG8gbGVhcm4g",
      maxLength = Some(1), isError = true),
    "base64 wrong minLength" -> Case("base64Binary",
      "Tm93IGlzIHRoZSB0aW1lIGZvciBhbGwgZ29vZCBjb2RlcnMKdG8gbGVhcm4g",
      minLength = Some(50), isError = true),
    "hex ok" -> Case("hexBinary", "0FB7", expect = Some("0FB7")),
    "hex length 2" -> Case("hexBinary", "0FB7", length = Some(2), expect = Some("0FB7")),
    "hex wrong maxLength" -> Case("hexBinary", "0FB7", maxLength = Some(1), isError = true),
    "hex wrong minLength" -> Case("hexBinary", "0FB7", minLength = Some(4), isError = true),
    // other string-ish
    "anyAtomicType" -> Case("anyAtomicType", "some thing", expect = Some("some thing")),
    "anyURI" -> Case("anyURI", "http://example.com/", expect = Some("http://example.com/")),
    "QName" -> Case("QName", "foo:bar", expect = Some("foo:bar")),
    "normalizedString" -> Case("normalizedString", "some thing", expect = Some("some thing")),
    "token" -> Case("token", "some thing", expect = Some("some thing")),
    "language" -> Case("language", "en", expect = Some("en")),
    "Name" -> Case("Name", "someThing", expect = Some("someThing")),
    "NMTOKEN" -> Case("NMTOKEN", "someThing", expect = Some("someThing")))

  cases.foreach { case (name, c) =>
    test(name) {
      val res = CellRuntime.process(columnFor(c), c.value)
      if (c.isError) {
        assert(res.errors.nonEmpty, s"expected errors, got ok: ${res.values.toSeq}")
        assert(res.values.headOption.forall(!_.ok))
      } else {
        assert(res.errors.isEmpty, s"unexpected errors: ${res.errors.toSeq}")
        c.expect.foreach(e => assert(res.values.head.lex == e))
        assert(res.values.head.ok)
      }
    }
  }
}
