package graft.mapper

import graft.model.{CsvwJson, SchemaMeta, TableGroupMeta, TableMeta}
import graft.sources.CsvDialectSource

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity for the embedded-metadata-only path
  * (`/root/reference/spec/data/country-codes-and-names.csv` →
  * `country-codes-and-names-minimal.ttl`): no metadata document at all —
  * the raw CSV's header row is the only schema, columns synthesize from
  * embedded titles, subjects are fresh (deterministic) bnodes and every
  * value is a plain string literal with a `tableUrl#column` predicate.
  */
class CountryCodesGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("country-codes-and-names.csv (embedded metadata only) matches the minimal ttl") {
    val url = "http://example.org/country-codes-and-names.csv"
    val csv = "country,name\nAD,Andorra\nAF,Afghanistan\nAI,Anguilla\nAL,Albania\n"
    val f = java.nio.file.Files.createTempFile("ccn", ".csv")
    java.nio.file.Files.writeString(f, csv)

    // end-to-end embedded path: exact scan → header titles → synthesized
    // columns → resolved table over the scanned rows
    val exact = CsvDialectSource.readExact(spark, f.toString,
      graft.model.DialectMeta())
    val embedded = CsvDialectSource.embeddedColumns(exact.headerTitles)
    val group = TableGroupMeta(tables = List(
      TableMeta(url = url, tableSchema = Some(SchemaMeta(columns = embedded)))))
    val table = graft.model.Resolve.group(group).head
    assert(table.columns.map(_.name) == List("country", "name"))

    val rows = exact.rows // _row, _sourceRow, _c1, _c2
    val inputs = Map("country" -> col("_c1"), "name" -> col("_c2"))
    val got = TripleMapper.triples(rows, table, inputs,
      skolem = col("_row"), rownum = col("_row"), sourceNum = col("_sourceRow"))
      .as[Triple].collect().toSet

    // transcribed from country-codes-and-names-minimal.ttl: four bnode row
    // subjects, two plain literals each, predicates <csv-url>#country/#name
    val expected = Seq(
      (1, "AD", "Andorra"), (2, "AF", "Afghanistan"),
      (3, "AI", "Anguilla"), (4, "AL", "Albania")).flatMap { case (r, cc, nm) => Seq(
        Triple(s"_:d$r", s"$url#country", cc, obj_iri = false, null, null),
        Triple(s"_:d$r", s"$url#name", nm, obj_iri = false, null, null))
    }.toSet
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")

    // JSON minimal mode over the same synthesized table matches the
    // reference's country-codes-and-names-minimal.json row objects
    val js = JsonOutput.minimalRows(rows, table, inputs,
      skolem = col("_row"), rownum = col("_row"), sourceNum = col("_sourceRow"))
    val objs = js.select(col("json")).as[String].collect().toSet
    assert(objs == Set(
      """{"country":"AD","name":"Andorra"}""",
      """{"country":"AF","name":"Afghanistan"}""",
      """{"country":"AI","name":"Anguilla"}""",
      """{"country":"AL","name":"Albania"}"""))
  }
}
