package graft.mapper

import graft.model.Resolve
import graft.sources.{CsvDialectSource, HtmlTableSource}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity for the two HTML document families of the reference suite
  * (`/root/reference/spec/reader_spec.rb:157-168`):
  *
  *  - `countries_embed.html` → `countries_embed-minimal.ttl`: the document
  *    carries BOTH the `csvm+json` metadata and the data tables; table urls
  *    are fragments (`#countries`), aboutUrl/valueUrl templates are
  *    fragment-relative and resolve against the document, and the FK routes
  *    between the two in-document tables.
  *  - `countries.html` → `countries_html-minimal.ttl`: the document carries
  *    only the metadata; table urls are relative CSV references that rebase
  *    to external files read through the exact CSV path.
  *
  * Both run end-to-end through [[HtmlTableSource.readDocument]] (script
  * metadata extraction + `TableGroupMeta.rebase`) and the full
  * [[CsvwPipeline]], exercising document-base url resolution that the other
  * golden families (all absolute-url metadata) never touch.
  */
class CountriesHtmlGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  type T = (String, String, String, Boolean, Option[String], Option[String])
  private def lit3(s: String, p: String, o: String, d: Option[String]): T =
    (s, p, o, false, None, d)

  private val xd = Some("http://www.w3.org/2001/XMLSchema#double")
  private val xi = Some("http://www.w3.org/2001/XMLSchema#integer")
  private val xg = Some("http://www.w3.org/2001/XMLSchema#gYear")
  private val geo = "http://www.geonames.org/ontology#"
  private val sch = "http://schema.org/"

  /** Bind one fragment/exact scan: resolved column names map positionally
    * onto the scan's `_c1.._cN`, numbering columns drive skolems/rownums.
    */
  private def bound(exact: CsvDialectSource.ExactResult,
                    t: graft.model.ResolvedTable): CsvwPipeline.BoundTable =
    CsvwPipeline.BoundTable(
      exact.rows,
      t.columns.filterNot(_.virtual).zipWithIndex
        .map { case (c, i) => c.name -> col(s"_c${i + 1}") }.toMap,
      skolem = col("_row"), rownum = col("_row"), sourceNum = col("_sourceRow"))

  // transcription of spec/data/countries_embed.html: two fragment-id
  // tables plus the csvm+json script block with fragment-relative urls
  private lazy val embedHtmlPath: String = {
    val f = java.nio.file.Files.createTempFile("countries_embed", ".html")
    java.nio.file.Files.writeString(f, embedHtml)
    f.toString
  }
  private val embedHtml =
      """<html><body>
        |<table id="countries"><caption>Countries</caption>
        |<tr><th>countryCode</th><th>latitude</th><th>longitude</th><th>name</th></tr>
        |<tr><td>AD</td><td>42.5</td><td>1.6</td><td>Andorra</td></tr>
        |<tr><td>AE</td><td>23.4</td><td>53.8</td><td>United Arab Emirates</td></tr>
        |<tr><td>AF</td><td>33.9</td><td>67.7</td><td>Afghanistan</td></tr>
        |</table>
        |<table id="country_slice"><caption>Country Slice</caption>
        |<tr><th>countryRef</th><th>year</th><th>population</th></tr>
        |<tr><td>AF</td><td>1960</td><td>9616353</td></tr>
        |<tr><td>AF</td><td>1961</td><td>9799379</td></tr>
        |<tr><td>AF</td><td>1962</td><td>9989846</td></tr>
        |</table>
        |<pre class="example">
        |<script type="application/csvm+json">
        |{
        |  "@context": "http://www.w3.org/ns/csvw",
        |  "tables": [{
        |    "url": "#countries",
        |    "tableSchema": {
        |      "columns": [
        |        {"name": "countryCode", "titles": "countryCode", "datatype": "string",
        |         "propertyUrl": "http://www.geonames.org/ontology{#_name}"},
        |        {"name": "latitude", "titles": "latitude", "datatype": "number"},
        |        {"name": "longitude", "titles": "longitude", "datatype": "number"},
        |        {"name": "name", "titles": "name", "datatype": "string"}
        |      ],
        |      "aboutUrl": "#countries_{countryCode}",
        |      "propertyUrl": "http://schema.org/{_name}",
        |      "primaryKey": "countryCode"
        |    }
        |  }, {
        |    "url": "#country_slice",
        |    "tableSchema": {
        |      "columns": [
        |        {"name": "countryRef", "titles": "countryRef",
        |         "valueUrl": "#countries_{countryRef}"},
        |        {"name": "year", "titles": "year", "datatype": "gYear"},
        |        {"name": "population", "titles": "population", "datatype": "integer"}
        |      ],
        |      "propertyUrl": "http://example.org/{_name}",
        |      "foreignKeys": [{
        |        "columnReference": "countryRef",
        |        "reference": {"resource": "#countries", "columnReference": "countryCode"}
        |      }]
        |    }
        |  }]
        |}
        |</script>
        |</pre>
        |</body></html>""".stripMargin

  test("countries_embed.html (in-document tables + fragment urls) matches the minimal ttl") {
    val docUrl = "http://example.org/countries_embed.html"
    val doc = HtmlTableSource.readDocument(spark, embedHtmlPath, docUrl)
    assert(doc.group.tables.map(_.url) ==
      List(s"$docUrl#countries", s"$docUrl#country_slice"))
    assert(doc.fragmentTables.keySet ==
      Set(s"$docUrl#countries", s"$docUrl#country_slice"))

    val resolved = Resolve.group(doc.group)
    val bind = resolved.map(t => t.url -> bound(doc.fragmentTables(t.url), t)).toMap
    val res = CsvwPipeline.run(spark, doc.group, bind,
      CsvwPipeline.Options(minimal = true))
    assert(res.fkViolations.values.forall(_.count() == 0))
    val got = res.triples.as[T].collect().toSet

    val ex = "http://example.org/"
    def subj(cc: String) = s"$docUrl#countries_$cc"
    // transcribed from spec/data/countries_embed-minimal.ttl (fresh slice
    // bnodes replaced by the deterministic skolems: HTML rows number from
    // (total tr count) + 1 = 5, matching metadata.rb:876-885 and the
    // rownum 5..7 in countries_embed-standard.ttl)
    val expected: Set[T] =
      Seq("AD" -> ("42.5", "1.6", "Andorra"),
          "AE" -> ("23.4", "53.8", "United Arab Emirates"),
          "AF" -> ("33.9", "67.7", "Afghanistan")).flatMap {
        case (cc, (lat, lon, nm)) => Seq(
          lit3(subj(cc), geo + "countryCode", cc, None),
          lit3(subj(cc), sch + "latitude", lat, xd),
          lit3(subj(cc), sch + "longitude", lon, xd),
          lit3(subj(cc), sch + "name", nm, None))
      }.toSet ++
      Seq((5, "1960", "9616353"), (6, "1961", "9799379"),
          (7, "1962", "9989846")).flatMap { case (r, yr, pop) => Seq[T](
        (s"_:d$r", ex + "countryRef", subj("AF"), true, None, None),
        lit3(s"_:d$r", ex + "year", yr, xg),
        lit3(s"_:d$r", ex + "population", pop, xi))
      }.toSet
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")
  }

  test("countries_embed.html JSON minimal mode matches countries_embed-minimal.json") {
    val docUrl = "http://example.org/countries_embed.html"
    val doc = HtmlTableSource.readDocument(spark, embedHtmlPath, docUrl)
    val resolved = Resolve.group(doc.group)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val got = resolved.flatMap { t =>
      val exact = doc.fragmentTables(t.url)
      JsonOutput.minimalRows(exact.rows, t,
          t.columns.filterNot(_.virtual).zipWithIndex
            .map { case (c, i) => c.name -> col(s"_c${i + 1}") }.toMap,
          skolem = col("_row"), rownum = col("_row"), sourceNum = col("_sourceRow"))
        .select(col("json")).as[String].collect().toSeq
    }.map(mapper.readTree).sortBy(_.toString)

    // transcribed from spec/data/countries_embed-minimal.json: @id only for
    // aboutUrl subjects, schema.org keys compacted via the CSVW context,
    // geonames/example.org keys left absolute, number/integer unboxed,
    // gYear kept lexical, valueUrl references as IRI strings
    val expected = {
      val arr = mapper.readTree("""[
        {"@id": "http://example.org/countries_embed.html#countries_AD",
         "http://www.geonames.org/ontology#countryCode": "AD",
         "schema:latitude": 42.5, "schema:longitude": 1.6,
         "schema:name": "Andorra"},
        {"@id": "http://example.org/countries_embed.html#countries_AE",
         "http://www.geonames.org/ontology#countryCode": "AE",
         "schema:latitude": 23.4, "schema:longitude": 53.8,
         "schema:name": "United Arab Emirates"},
        {"@id": "http://example.org/countries_embed.html#countries_AF",
         "http://www.geonames.org/ontology#countryCode": "AF",
         "schema:latitude": 33.9, "schema:longitude": 67.7,
         "schema:name": "Afghanistan"},
        {"http://example.org/countryRef": "http://example.org/countries_embed.html#countries_AF",
         "http://example.org/year": "1960", "http://example.org/population": 9616353},
        {"http://example.org/countryRef": "http://example.org/countries_embed.html#countries_AF",
         "http://example.org/year": "1961", "http://example.org/population": 9799379},
        {"http://example.org/countryRef": "http://example.org/countries_embed.html#countries_AF",
         "http://example.org/year": "1962", "http://example.org/population": 9989846}
      ]""")
      (0 until arr.size).map(arr.get).sortBy(_.toString)
    }
    assert(got == expected,
      s"got:\n${got.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
  }

  test("countries.html (metadata-only document, external CSVs) matches the minimal ttl") {
    // transcription of spec/data/countries.html's script block: relative
    // CSV urls and relative aboutUrl/valueUrl templates
    val html =
      """<html><body>
        |<p>metadata referencing an external CSV</p>
        |<pre class="example">
        |<script type="application/csvm+json">
        |{
        |  "@context": "http://www.w3.org/ns/csvw",
        |  "tables": [{
        |    "url": "countries.csv",
        |    "tableSchema": {
        |      "columns": [
        |        {"name": "countryCode", "titles": "countryCode", "datatype": "string",
        |         "propertyUrl": "http://www.geonames.org/ontology{#_name}"},
        |        {"name": "latitude", "titles": "latitude", "datatype": "number"},
        |        {"name": "longitude", "titles": "longitude", "datatype": "number"},
        |        {"name": "name", "titles": "name", "datatype": "string"}
        |      ],
        |      "aboutUrl": "countries.csv{#countryCode}",
        |      "propertyUrl": "http://schema.org/{_name}",
        |      "primaryKey": "countryCode"
        |    }
        |  }, {
        |    "url": "country_slice.csv",
        |    "tableSchema": {
        |      "columns": [
        |        {"name": "countryRef", "titles": "countryRef",
        |         "valueUrl": "countries.csv{#countryRef}"},
        |        {"name": "year", "titles": "year", "datatype": "gYear"},
        |        {"name": "population", "titles": "population", "datatype": "integer"}
        |      ],
        |      "foreignKeys": [{
        |        "columnReference": "countryRef",
        |        "reference": {"resource": "countries.csv", "columnReference": "countryCode"}
        |      }]
        |    }
        |  }]
        |}
        |</script>
        |</pre>
        |</body></html>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("countries_html")
    val hf = dir.resolve("countries.html")
    java.nio.file.Files.writeString(hf, html)
    // spec/data/countries.csv + country_slice.csv
    java.nio.file.Files.writeString(dir.resolve("countries.csv"),
      "countryCode,latitude,longitude,name\n" +
      "AD,42.546245,1.601554,Andorra\n" +
      "AE,23.424076,53.847818,\"United Arab Emirates\"\n" +
      "AF,33.93911,67.709953,Afghanistan\n")
    java.nio.file.Files.writeString(dir.resolve("country_slice.csv"),
      "countryRef,year,population\nAF,1960,9616353\nAF,1961,9799379\nAF,1962,9989846\n")

    val docUrl = "http://example.org/countries.html"
    val doc = HtmlTableSource.readDocument(spark, hf.toString, docUrl)
    val cUrl = "http://example.org/countries.csv"
    val sUrl = "http://example.org/country_slice.csv"
    assert(doc.group.tables.map(_.url) == List(cUrl, sUrl))
    assert(doc.fragmentTables.isEmpty) // data lives outside the document

    val resolved = Resolve.group(doc.group)
    val bind = resolved.map { t =>
      val file = dir.resolve(t.url.split('/').last).toString
      t.url -> bound(CsvDialectSource.readExact(spark, file, graft.model.DialectMeta()), t)
    }.toMap
    val res = CsvwPipeline.run(spark, doc.group, bind,
      CsvwPipeline.Options(minimal = true))
    assert(res.fkViolations.values.forall(_.count() == 0))
    val got = res.triples.as[T].collect().toSet

    // transcribed from spec/data/countries_html-minimal.ttl
    val expected: Set[T] =
      Seq("AD" -> ("42.546245", "1.601554", "Andorra"),
          "AE" -> ("23.424076", "53.847818", "United Arab Emirates"),
          "AF" -> ("33.93911", "67.709953", "Afghanistan")).flatMap {
        case (cc, (lat, lon, nm)) => Seq(
          lit3(s"$cUrl#$cc", geo + "countryCode", cc, None),
          lit3(s"$cUrl#$cc", sch + "latitude", lat, xd),
          lit3(s"$cUrl#$cc", sch + "longitude", lon, xd),
          lit3(s"$cUrl#$cc", sch + "name", nm, None))
      }.toSet ++
      Seq((1, "1960", "9616353"), (2, "1961", "9799379"),
          (3, "1962", "9989846")).flatMap { case (r, yr, pop) => Seq[T](
        (s"_:d$r", s"$sUrl#countryRef", s"$cUrl#AF", true, None, None),
        lit3(s"_:d$r", s"$sUrl#year", yr, xg),
        lit3(s"_:d$r", s"$sUrl#population", pop, xi))
      }.toSet
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")
  }
}
