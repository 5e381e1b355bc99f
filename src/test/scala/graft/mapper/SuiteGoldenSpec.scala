package graft.mapper

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** File-driven golden parity with the reference's own test-file table
  * (`/root/reference/spec/reader_spec.rb:157-168`): each family runs the
  * ACTUAL fixture files under `/root/reference/spec/data` through the
  * production entry point ([[CsvwReader.open]] — discovery, dialect scan,
  * embedded metadata, schema indirection, pipeline) and compares the triple
  * set against the reference's committed `.ttl` goldens parsed by
  * [[TurtleLite]], under blank-node isomorphism — exactly the
  * `be_equivalent_graph` check the reference suite performs. Unlike the
  * hand-transcribed per-family golden specs, nothing here is copied by
  * hand: a transcription error is impossible.
  */
class SuiteGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Data = "/root/reference/spec/data"

  private def runFamily(input: String, ttl: String, minimal: Boolean): Unit = {
    import spark.implicits._
    val base = "http://example.org/" + input
    val opened = CsvwReader.open(spark, s"$Data/$input", base, minimal = minimal)
    val got = opened.result.triples
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect().toSet
      .map((t: (String, String, String, Boolean, Option[String], Option[String])) =>
        Triple(t._1, t._2, t._3, t._4, t._5.orNull, t._6.orNull))
    val want = TurtleLite.parse(Files.readString(Paths.get(s"$Data/$ttl")), base)
    assert(TurtleLite.isomorphic(got, want),
      s"\n=== $input vs $ttl ===\n" + TurtleLite.diff(got, want))
  }

  // the reference's test_files map (reader_spec.rb:157-168), both modes
  private val families = Seq(
    "tree-ops.csv" -> "tree-ops-standard.ttl",
    "tree-ops.csv-metadata.json" -> "tree-ops-standard.ttl",
    "tree-ops-ext.json" -> "tree-ops-ext-standard.ttl",
    "tree-ops-virtual.json" -> "tree-ops-virtual-standard.ttl",
    "country-codes-and-names.csv" -> "country-codes-and-names-standard.ttl",
    "countries.json" -> "countries-standard.ttl",
    "countries.csv" -> "countries.csv-standard.ttl",
    "countries.html" -> "countries_html-standard.ttl",
    "countries_embed.html" -> "countries_embed-standard.ttl",
    "roles.json" -> "roles-standard.ttl")

  families.foreach { case (input, standardTtl) =>
    test(s"$input minimal mode matches ${standardTtl.replace("standard", "minimal")}") {
      runFamily(input, standardTtl.replace("standard", "minimal"), minimal = true)
    }
    test(s"$input standard mode matches $standardTtl") {
      runFamily(input, standardTtl, minimal = false)
    }
  }

  // ---- to_json parity (reader_spec.rb:207-246): same families, JSON side

  /** Jackson trees with numeric-type canonicalization (IntNode(1) and
    * LongNode(1) must compare equal) → plain Scala structures.
    */
  private def norm(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> norm(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(norm).toList
    else if (n.isNumber) BigDecimal(n.decimalValue()).underlying.stripTrailingZeros
    else if (n.isTextual) n.asText()
    else if (n.isBoolean) n.asBoolean()
    else null
  }

  private def runJsonFamily(input: String, jsonGolden: String, minimal: Boolean): Unit = {
    val base = "http://example.org/" + input
    val opened = CsvwReader.open(spark, s"$Data/$input", base, minimal = minimal)
    val got = CsvwReader.jsonDocument(opened, minimal)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val gotN = norm(mapper.readTree(got))
    val wantN = norm(mapper.readTree(Files.readString(Paths.get(s"$Data/$jsonGolden"))))
    assert(gotN == wantN, s"\n=== $input vs $jsonGolden ===\ngot:  $got")
  }

  families.foreach { case (input, standardTtl) =>
    val stdJson = standardTtl.replace(".ttl", ".json")
    test(s"$input to_json minimal matches ${stdJson.replace("standard", "minimal")}") {
      runJsonFamily(input, stdJson.replace("standard", "minimal"), minimal = true)
    }
    test(s"$input to_json standard matches $stdJson") {
      runJsonFamily(input, stdJson, minimal = false)
    }
  }

  // ---- validate-mode parity (reader_spec.rb:278-288): test232 duplicate PK

  test("test232: duplicate primary key raises in validate mode") {
    val base = "http://example.org/test232-metadata.json"
    val opened = CsvwReader.open(spark, s"$Data/test232-metadata.json", base,
      minimal = true, validate = true)
    // both rows carry PK value "1" — one duplicated key group
    val pk = opened.result.pkViolations.values.head.collect()
    assert(pk.map(_.getString(0)).toSeq == Seq("1"), pk.toSeq)
    assert(opened.result.severityCounts("pk_violation_error") == 1L)
    // "Errors found during processing" (reader.rb:265-267)
    intercept[IllegalStateException] { opened.result.raiseOnErrors() }
  }

  test("tree-ops.tsv: tab dialect by extension, embedded-only metadata") {
    import spark.implicits._
    val base = "http://example.org/tree-ops.tsv"
    val opened = CsvwReader.open(spark, s"$Data/tree-ops.tsv", base, minimal = true)
    // names synthesize from the tab-split header titles, pct-encoded
    assert(opened.resolved.head.columns.map(_.name) ==
      List("GID", "On%20Street", "Species", "Trim%20Cycle", "Inventory%20Date"))
    val got = opened.result.triples
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect()
    val rows = got.map(_._1).distinct.length
    assert(got.length == rows * 5, s"${got.length} triples for $rows rows")
    assert(got.exists(t => t._2 == s"$base#GID" && t._3 == "1"))
    assert(got.exists(t => t._2 == s"$base#On%20Street" && t._3 == "ADDISON AV"))
  }

  test("streamed minimal JSON document is byte-identical to the collected one") {
    // countries.json: two tables, so the stream also crosses a table
    // boundary; writeMinimalJson is the row-count-unbounded path
    val base = "http://example.org/countries.json"
    val opened = CsvwReader.open(spark, s"$Data/countries.json", base, minimal = true)
    val collected = CsvwReader.jsonDocument(opened, minimal = true)
    val out = Files.createTempFile("graft_stream_json", ".json")
    CsvwReader.writeMinimalJson(opened, out)
    assert(Files.readString(out) == collected)
  }

  test("streamed standard JSON document is byte-identical to the collected one") {
    // countries.json carries table-group + table common properties, so the
    // spliced headers (@id/common/url before the streamed row array) are
    // exercised, not just the bare-url shape
    val base = "http://example.org/countries.json"
    val opened = CsvwReader.open(spark, s"$Data/countries.json", base, minimal = false)
    val collected = CsvwReader.jsonDocument(opened, minimal = false)
    val out = Files.createTempFile("graft_stream_json_std", ".json")
    CsvwReader.writeStandardJson(opened, out)
    assert(Files.readString(out) == collected)
  }

  test("countries.json: consistent foreign keys validate clean (reader_spec.rb:291-298)") {
    val base = "http://example.org/countries.json"
    val opened = CsvwReader.open(spark, s"$Data/countries.json", base,
      minimal = true, validate = true)
    assert(opened.result.fkViolations.values.forall(_.count() == 0))
    assert(opened.result.pkViolations.values.forall(_.count() == 0))
    opened.result.raiseOnErrors() // must not throw
  }
}
