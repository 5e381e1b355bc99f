package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** HTML table scan (S2) against structures lifted from the reference's
  * fixtures (`spec/data/countries.html`, `spec/data/tree-ops.html`); the
  * numbering expectation comes from `countries_embed-standard.ttl`
  * (rownum 5..7 for a 4-tr table: the reference counts every tr in its
  * pre-scan, then numbers data rows after that total).
  */
class HtmlTableSourceSpec extends AnyFunSuite {
  lazy val spark = graft.mapper.TestSpark.spark

  private val countriesHtml = """<html><body>
    <table id="countries">
      <caption>Countries</caption>
      <tr><th>countryCode</th><th>latitude</th><th>longitude</th><th>name</th></tr>
      <tr><td>AD</td><td>42.5</td><td>1.6</td><td>Andorra</td></tr>
      <tr><td>AE</td><td>23.4</td><td>53.8</td><td>United Arab Emirates</td></tr>
      <tr><td>AF</td><td>33.9</td><td>67.7</td><td>Afghanistan</td></tr>
    </table>
    <table id="country_slice">
      <caption>Country Slice</caption>
      <tr><th>countryRef</th><th>year</th><th>population</th></tr>
      <tr><td>AF</td><td>1960</td><td>9616353</td></tr>
    </table></body></html>"""

  test("fragment-selected table with header titles and data rows") {
    val (titles, rows) = HtmlTableSource.extract(countriesHtml, Some("countries"))
    assert(titles == List(List("countryCode"), List("latitude"), List("longitude"), List("name")))
    assert(rows.map(_._2.head) == List("AD", "AE", "AF"))
    // source row = (total tr count) + data-row index: the reference's HTML
    // pre-scan advances the counter once per tr, header or not
    // (metadata.rb:876-885; countries_embed-standard.ttl rownum 5..7)
    assert(rows.map(_._1) == List(5L, 6L, 7L))
  }

  test("second fragment selects the other table; missing fragment throws") {
    val (_, rows) = HtmlTableSource.extract(countriesHtml, Some("country_slice"))
    assert(rows.map(_._2) == List(List("AF", "1960", "9616353")))
    intercept[IllegalArgumentException] {
      HtmlTableSource.extract(countriesHtml, Some("nope"))
    }
  }

  test("mixed th/td rows contribute both header titles and a data row") {
    // row-label tables: the reference collects row.xpath('td') as data
    // whenever td cells exist, independent of th cells (metadata.rb:878-881)
    val html = """<table>
      <tr><th>k</th><th>v</th></tr>
      <tr><th>row1</th><td>a</td><td>1</td></tr>
      <tr><th>row2</th><td>b</td><td>2</td></tr>
    </table>"""
    val (titles, rows) = HtmlTableSource.extract(html, None)
    assert(rows.map(_._2) == List(List("a", "1"), List("b", "2")))
    // the th cells of the mixed rows still land in the header pool
    assert(titles.head.contains("k") && titles.head.contains("row1"))
  }

  test("readTable produces readExact-shaped rows with logical/source numbering") {
    val tmp = java.nio.file.Files.createTempFile("graft_html_spec", ".html")
    java.nio.file.Files.writeString(tmp, countriesHtml)
    val res = HtmlTableSource.readTable(spark, tmp.toString, Some("countries"))
    val rows = res.rows.orderBy("_row").collect()
    assert(rows.length == 3)
    // HTML logical row numbers equal source numbers (tr-count-based)
    assert(rows(0).getLong(0) == 5L && rows(0).getLong(1) == 5L && rows(0).getString(2) == "AD")
    assert(rows(2).getLong(0) == 7L && rows(2).getLong(1) == 7L && rows(2).getString(5) == "Afghanistan")
    assert(res.headerTitles == List(List("countryCode"), List("latitude"), List("longitude"), List("name")))
  }

  test("entities unescape and nested tags strip in cells") {
    val html = """<table><tr><th>h</th></tr><tr><td> <b>A &amp; B</b> &lt;x&gt; </td></tr></table>"""
    val (_, rows) = HtmlTableSource.extract(html, None)
    assert(rows.head._2 == List("A & B <x>"))
  }

  test("embedded csvm+json script metadata extraction (tree-ops.html pattern)") {
    val html = """<html><head>
      <script type="application/csvm+json">
      {"url": "tree-ops.csv", "tableSchema": {"columns": [{"name": "GID"}]}}
      </script></head><body></body></html>"""
    val meta = HtmlTableSource.scriptMetadata(html)
    assert(meta.isDefined)
    val tg = graft.model.CsvwJson.parseTableGroup(meta.get)
    assert(tg.tables.head.url == "tree-ops.csv")
    assert(tg.tables.head.tableSchema.get.columns.head.name.contains("GID"))
  }
}
