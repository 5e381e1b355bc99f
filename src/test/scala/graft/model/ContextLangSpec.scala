package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** The JSON-LD context `@language` applies to natural-language properties
  * parsed anywhere in the document (`metadata.rb:1139` normalizes bare
  * titles to `{(context.default_language || 'und') => value}`), and column
  * name resolution checks the context bucket first (`metadata.rb:1630`).
  */
class ContextLangSpec extends AnyFunSuite {

  test("bare titles take the context @language") {
    val json = """{
      "@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
      "url": "http://e/t.csv",
      "tableSchema": {"columns": [
        {"titles": "Pretty Title"},
        {"titles": ["One", "Two"]},
        {"titles": {"fr": "Explicite"}}]}}"""
    val cols = CsvwJson.parseTableGroup(json).tables.head.tableSchema.get.columns
    assert(cols(0).titles == List("en" -> "Pretty Title"))
    assert(cols(1).titles == List("en" -> "One", "en" -> "Two"))
    assert(cols(2).titles == List("fr" -> "Explicite"))
  }

  test("without a context @language bare titles stay und") {
    val json = """{"url": "http://e/t.csv",
      "tableSchema": {"columns": [{"titles": "T"}]}}"""
    val cols = CsvwJson.parseTableGroup(json).tables.head.tableSchema.get.columns
    assert(cols.head.titles == List("und" -> "T"))
  }

  test("column name resolves through the context-tagged title") {
    val json = """{
      "@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
      "url": "http://e/t.csv",
      "tableSchema": {"columns": [{"titles": "Pretty Title"}]}}"""
    val t = Resolve.group(CsvwJson.parseTableGroup(json)).head
    assert(t.columns.head.name == "Pretty%20Title")
  }

  test("name lookup order: context bucket before column-lang bucket") {
    // metadata.rb:1630 — titles[cdl || 'und'] || titles[lang || 'und']
    val c = ColumnMeta(titles = List("en" -> "English", "fr" -> "French"))
    assert(Resolve.columnName(c, 1, "fr", Some("en")) == "English")
    assert(Resolve.columnName(c, 1, "fr", None) == "French")
    // no matching bucket at all → positional name
    assert(Resolve.columnName(c, 3, "de", None) == "_col.3")
  }
}
