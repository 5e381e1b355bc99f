package graft.model

import org.scalatest.funsuite.AnyFunSuite

class CsvwModelSpec extends AnyFunSuite {

  test("countries-shaped two-table group with foreign keys") {
    // shape of /root/reference/spec/data/countries.json (recast)
    val json = """{
      "@type": "TableGroup",
      "tables": [
        {"url": "http://e/countries.csv",
         "tableSchema": {
           "aboutUrl": "http://e/countries.csv{#countryCode}",
           "primaryKey": "countryCode",
           "columns": [
             {"name": "countryCode", "datatype": "string",
              "propertyUrl": "http://e/countries.csv#countryCode"},
             {"name": "latitude", "datatype": "number"},
             {"name": "name", "datatype": "string"}]}},
        {"url": "http://e/slice.csv",
         "tableSchema": {
           "columns": [
             {"name": "countryRef", "valueUrl": "http://e/countries.csv{#countryRef}"},
             {"name": "year", "datatype": "gYear"},
             {"name": "population", "datatype": "integer"}],
           "foreignKeys": [
             {"columnReference": "countryRef",
              "reference": {"resource": "http://e/countries.csv",
                            "columnReference": "countryCode"}}]}}]}"""
    val tables = Resolve.group(CsvwJson.parseTableGroup(json))
    assert(tables.length == 2)
    assert(tables.head.primaryKey == List("countryCode"))
    assert(tables.head.columns.head.aboutUrl.isDefined)
    assert(tables.head.columns(1).datatypeBase == "double") // number alias
    val fk = tables(1).foreignKeys.head
    assert(fk.columnReference == List("countryRef") && fk.resource == "http://e/countries.csv")
    assert(fk.referencedColumns == List("countryCode"))
    assert(tables(1).columns(1).datatypeBase == "gYear")
  }

  test("inheritance: table-level inherited props reach columns") {
    val json = """{
      "url": "http://e/t.csv",
      "aboutUrl": "urn:row:{_row}",
      "lang": "en",
      "null": ["-"],
      "tableSchema": {
        "separator": ";",
        "columns": [
          {"name": "a"},
          {"name": "b", "lang": "fr", "null": ["x"]}]}}"""
    val t = Resolve.group(CsvwJson.parseTableGroup(json)).head
    val a = t.columns.head
    val b = t.columns(1)
    assert(a.lang == "en" && a.nulls == List("-") && a.separator.contains(";"))
    assert(a.aboutUrl.isDefined)
    assert(b.lang == "fr" && b.nulls == List("x"))
  }

  test("column name defaults: title encoding and _col.N") {
    val json = """{
      "url": "http://e/t.csv",
      "tableSchema": {"columns": [
        {"titles": "country name"},
        {},
        {"name": "explicit"}]}}"""
    val t = Resolve.group(CsvwJson.parseTableGroup(json)).head
    assert(t.columns(0).name == "country%20name")
    assert(t.columns(1).name == "_col.2")
    assert(t.columns(2).name == "explicit")
  }

  test("column name bucket order: context default language, then declared lang") {
    // metadata.rb:1630: titles[context.default_language || 'und'] ||
    // titles[self.lang || 'und'] — with NO context @language the FIRST
    // lookup is the 'und' bucket, so it wins even over a declared lang;
    // with a context @language that bucket is checked first
    val json = """{
      "url": "http://e/t.csv",
      "tableSchema": {"columns": [
        {"lang": "en", "titles": {"und": "staat", "en": "country"}},
        {"titles": {"und": "staat", "en": "country"}}]}}"""
    val t = Resolve.group(CsvwJson.parseTableGroup(json)).head
    assert(t.columns(0).name == "staat")
    assert(t.columns(1).name == "staat")
    val withCtx = """{
      "@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
      "url": "http://e/t.csv",
      "tableSchema": {"columns": [
        {"titles": {"und": "staat", "en": "country"}}]}}"""
    val t2 = Resolve.group(CsvwJson.parseTableGroup(withCtx)).head
    assert(t2.columns(0).name == "country")
  }

  test("dialect dynamic defaults: headerRowCount and trim") {
    assert(DialectMeta().effectiveHeaderRowCount == 1)
    assert(DialectMeta(header = false).effectiveHeaderRowCount == 0)
    assert(DialectMeta(headerRowCount = Some(2)).effectiveHeaderRowCount == 2)
    assert(DialectMeta().effectiveTrim == "true")
    assert(DialectMeta(skipInitialSpace = true).effectiveTrim == "start")
    assert(DialectMeta(trim = Some("end")).effectiveTrim == "end")
  }

  test("skipColumns shifts sourceNumber") {
    val json = """{
      "url": "http://e/t.csv",
      "dialect": {"skipColumns": 2},
      "tableSchema": {"columns": [{"name": "a"}, {"name": "b"}]}}"""
    val t = Resolve.group(CsvwJson.parseTableGroup(json)).head
    assert(t.columns.map(c => (c.number, c.sourceNumber)) == List((1, 3), (2, 4)))
  }

  test("bare table and bare schema documents normalize to a group") {
    assert(Resolve.group(CsvwJson.parseTableGroup(
      """{"url": "http://e/t.csv"}""")).head.url == "http://e/t.csv")
    assert(Resolve.group(CsvwJson.parseTableGroup(
      """{"columns": [{"name": "x"}]}""")).head.columns.head.name == "x")
  }

  test("datatype facets parsed, minimum aliases minInclusive") {
    val json = """{
      "url": "http://e/t.csv",
      "tableSchema": {"columns": [
        {"name": "n", "datatype": {"base": "integer", "minInclusive": 5, "maxExclusive": 10}}]}}"""
    val c = Resolve.group(CsvwJson.parseTableGroup(json)).head.columns.head
    assert(c.minimum.contains("5") && c.maxExclusive.contains("10"))
  }
}
