package graft.expr

import graft.model.{CsvwJson, Resolve}
import org.scalatest.funsuite.AnyFunSuite

/** Datatype/facet matrix in the spirit of the reference's
  * `spec/metadata_spec.rb:1173-1479` (valid/invalid per base + facets),
  * driven through the plan-time-compiled cell pipeline.
  */
class CellRuntimeSpec extends AnyFunSuite {

  def colFor(datatypeJson: String, extra: String = ""): graft.model.ResolvedColumn = {
    val json = s"""{"url":"http://e/t","tableSchema":{"columns":[
      {"name":"v","datatype":$datatypeJson$extra}]}}"""
    Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
  }

  def run(dt: String, v: String): CellResult = CellRuntime.process(colFor(dt), v)
  def okLex(dt: String, v: String): Option[String] = {
    val r = run(dt, v)
    r.values.headOption.filter(_.ok).map(_.lex)
  }
  def isErr(dt: String, v: String): Boolean = run(dt, v).errors.nonEmpty

  test("string keeps raw whitespace") {
    assert(okLex("\"string\"", "  a  b  ") == Some("  a  b  "))
  }
  test("token collapses whitespace") {
    assert(okLex("\"token\"", " a \t b ") == Some("a b"))
  }
  test("normalizedString keeps inner spaces") {
    assert(okLex("\"normalizedString\"", "a  b") == Some("a  b"))
  }

  // integer family
  test("integer valid") { assert(okLex("\"integer\"", "42") == Some("42")) }
  test("integer invalid degrades") {
    val r = run("\"integer\"", "x42")
    assert(r.errors.nonEmpty && r.values.head.lex == "x42" && !r.values.head.ok)
  }
  test("byte range") {
    assert(okLex("\"byte\"", "127") == Some("127"))
    assert(isErr("\"byte\"", "128"))
  }
  test("unsignedInt rejects negatives") { assert(isErr("\"unsignedInt\"", "-1")) }
  test("negativeInteger") {
    assert(okLex("\"negativeInteger\"", "-5") == Some("-5"))
    assert(isErr("\"negativeInteger\"", "0"))
  }

  // decimal/double
  test("decimal keeps lexical form") {
    assert(okLex("\"decimal\"", "42.546245") == Some("42.546245"))
  }
  test("double NaN INF") {
    assert(okLex("\"double\"", "NaN") == Some("NaN"))
    assert(okLex("\"double\"", "INF") == Some("INF"))
    assert(okLex("\"double\"", "-INF") == Some("-INF"))
  }
  test("number alias is double") {
    assert(okLex("\"number\"", "1.5e3") == Some("1.5e3"))
  }
  test("numeric group chars stripped by default pattern") {
    assert(okLex("\"integer\"", "1,234") == Some("1234"))
  }
  test("numeric minimum facet") {
    val c = colFor("""{"base":"integer","minimum":10}""")
    assert(CellRuntime.process(c, "9").errors.nonEmpty)
    assert(CellRuntime.process(c, "10").errors.isEmpty)
  }
  test("custom number pattern") {
    val c = colFor("""{"base":"decimal","format":"0.00"}""")
    assert(CellRuntime.process(c, "1.23").values.head.ok)
    assert(CellRuntime.process(c, "1.2").errors.nonEmpty)
  }

  // boolean
  test("boolean default forms") {
    assert(okLex("\"boolean\"", "true") == Some("true"))
    assert(okLex("\"boolean\"", "1") == Some("true"))
    assert(okLex("\"boolean\"", "FALSE") == Some("false"))
    assert(okLex("\"boolean\"", "0") == Some("false"))
    assert(isErr("\"boolean\"", "yes"))
  }
  test("boolean Y|N format") {
    val c = colFor("""{"base":"boolean","format":"Y|N"}""")
    assert(CellRuntime.process(c, "Y").values.head.lex == "true")
    assert(CellRuntime.process(c, "N").values.head.lex == "false")
    assert(CellRuntime.process(c, "true").errors.nonEmpty)
  }

  // dates
  test("date without format validates lexical") {
    assert(okLex("\"date\"", "2015-03-22") == Some("2015-03-22"))
    assert(isErr("\"date\"", "2015-19-22"))
  }
  test("date with format canonicalizes") {
    val c = colFor("""{"base":"date","format":"M/d/yyyy"}""")
    assert(CellRuntime.process(c, "3/22/2015").values.head.lex == "2015-03-22")
  }
  test("dateTimeStamp requires timezone") {
    assert(isErr("\"dateTimeStamp\"", "2015-03-22T10:00:00"))
    assert(okLex("\"dateTimeStamp\"", "2015-03-22T10:00:00Z") == Some("2015-03-22T10:00:00Z"))
  }
  test("datetime alias") {
    assert(okLex("\"datetime\"", "2015-03-22T10:00:00") == Some("2015-03-22T10:00:00"))
  }

  // durations
  test("duration lexical") {
    assert(okLex("\"duration\"", "P1Y2M3DT4H5M6S") == Some("P1Y2M3DT4H5M6S"))
    assert(isErr("\"duration\"", "1Y"))
  }
  test("dayTimeDuration rejects year part") { assert(isErr("\"dayTimeDuration\"", "P1Y")) }

  // binary
  test("hexBinary with length facet (decoded bytes)") {
    val c = colFor("""{"base":"hexBinary","length":2}""")
    assert(CellRuntime.process(c, "ABCD").errors.isEmpty)
    assert(CellRuntime.process(c, "ABCDEF").errors.nonEmpty)
  }
  test("base64Binary validity") {
    assert(okLex("\"base64Binary\"", "aGVsbG8=") == Some("aGVsbG8="))
    assert(isErr("\"base64Binary\"", "!!not-base64!!"))
  }

  // string facets + format regex
  test("string length facets") {
    val c = colFor("""{"base":"string","minLength":3,"maxLength":5}""")
    assert(CellRuntime.process(c, "abcd").errors.isEmpty)
    assert(CellRuntime.process(c, "ab").errors.nonEmpty)
    assert(CellRuntime.process(c, "abcdef").errors.nonEmpty)
  }
  test("string format regex") {
    val c = colFor("""{"base":"string","format":"^[A-Z]{2}$"}""")
    assert(CellRuntime.process(c, "GB").errors.isEmpty)
    assert(CellRuntime.process(c, "gbx").errors.nonEmpty)
  }

  // null / default / separator / required
  test("null list maps to SQL null") {
    val json = """{"url":"http://e/t","tableSchema":{"columns":[
      {"name":"v","datatype":"string","null":["NA",""]}]}}"""
    val c = Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
    val r = CellRuntime.process(c, "NA")
    assert(r.isNull && r.values.isEmpty)
  }
  test("default substitution on empty") {
    val json = """{"url":"http://e/t","tableSchema":{"columns":[
      {"name":"v","datatype":"string","default":"fallback","null":["NA"]}]}}"""
    val c = Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
    assert(CellRuntime.process(c, "").values.head.lex == "fallback")
  }
  test("separator splits and types elements") {
    val json = """{"url":"http://e/t","tableSchema":{"columns":[
      {"name":"v","datatype":"integer","separator":";"}]}}"""
    val c = Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
    val r = CellRuntime.process(c, "1; 2 ;3")
    assert(r.values.map(_.lex).toSeq == Seq("1", "2", "3"))
    assert(r.values.forall(_.ok))
  }
  test("required rejects empty") {
    val json = """{"url":"http://e/t","tableSchema":{"columns":[
      {"name":"v","datatype":"string","required":true,"null":["x"]}]}}"""
    val c = Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
    assert(CellRuntime.process(c, "x").errors.nonEmpty)
  }
  test("unsupported datatype rejected at plan time") {
    intercept[IllegalArgumentException] {
      colFor("\"ID\"")
    }
  }
}
