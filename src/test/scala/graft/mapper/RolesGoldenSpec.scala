package graft.mapper

import graft.model.CsvwJson

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-group golden parity with the reference's roles fixture
  * (`/root/reference/spec/data/roles.json` + `senior-roles.csv/.json` +
  * `junior-roles.csv/.json` → `roles-minimal.ttl`): a three-table group with
  * a suppressed lookup table, compact-prefix propertyUrls (dc:, foaf:),
  * null-substitution on an FK column (`null: "xx"` — the cell collects no
  * reference and emits no triple), document-relative valueUrl templates
  * into a sibling table, integer/double datatypes keeping lexical form, and
  * bnode subjects for the aboutUrl-less junior table.
  */
class RolesGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("roles three-table group matches roles-minimal.ttl") {
    val meta = """{
      "tables": [{
        "url": "http://example.org/gov.uk/professions.csv",
        "suppressOutput": true,
        "tableSchema": {
          "columns": [
            {"name": "name", "titles": "Profession", "datatype": "string", "required": true}
          ],
          "primaryKey": "name"
        }
      }, {
        "url": "http://example.org/senior-roles.csv",
        "tableSchema": {
          "columns": [
            {"name": "ref", "titles": "Post Unique Reference", "datatype": "string",
             "required": true, "propertyUrl": "dc:identifier"},
            {"name": "name", "titles": "Name", "datatype": "string",
             "propertyUrl": "foaf:name"},
            {"name": "grade", "titles": "Grade", "datatype": "string",
             "propertyUrl": "http://example.org/def/grade"},
            {"name": "job", "titles": "Job Title", "datatype": "string",
             "propertyUrl": "http://example.org/def/job"},
            {"name": "reportsTo", "titles": "Reports to Senior Post", "datatype": "string",
             "null": "xx", "propertyUrl": "http://example.org/def/reportsTo",
             "valueUrl": "senior-roles.csv#post-{reportsTo}"},
            {"name": "profession", "titles": "Profession", "datatype": "string",
             "propertyUrl": "http://example.org/def/profession"}
          ],
          "primaryKey": "ref",
          "aboutUrl": "#post-{ref}",
          "foreignKeys": [
            {"columnReference": "reportsTo",
             "reference": {"resource": "http://example.org/senior-roles.csv",
                           "columnReference": "ref"}},
            {"columnReference": "profession",
             "reference": {"resource": "http://example.org/gov.uk/professions.csv",
                           "columnReference": "name"}}
          ]
        }
      }, {
        "url": "http://example.org/junior-roles.csv",
        "tableSchema": {
          "columns": [
            {"name": "reportsToSenior", "titles": "Reporting Senior Post", "datatype": "string",
             "required": true, "propertyUrl": "http://example.org/def/reportsTo",
             "valueUrl": "senior-roles.csv#post-{reportsToSenior}"},
            {"name": "grade", "titles": "Grade", "datatype": "string",
             "propertyUrl": "http://example.org/def/grade"},
            {"name": "min_pay", "titles": "Payscale Minimum", "datatype": "integer",
             "propertyUrl": "http://example.org/def/min_pay"},
            {"name": "max_pay", "titles": "Payscale Maximum", "datatype": "integer",
             "propertyUrl": "http://example.org/def/max_pay"},
            {"name": "job", "titles": "Generic Job Title", "datatype": "string",
             "propertyUrl": "http://example.org/def/job"},
            {"name": "number", "titles": "Number of Posts", "datatype": "number",
             "propertyUrl": "http://example.org/def/number-of-posts"},
            {"name": "profession", "titles": "Profession", "datatype": "string",
             "propertyUrl": "http://example.org/def/profession"}
          ],
          "foreignKeys": [
            {"columnReference": "reportsToSenior",
             "reference": {"resource": "http://example.org/senior-roles.csv",
                           "columnReference": "ref"}},
            {"columnReference": "profession",
             "reference": {"resource": "http://example.org/gov.uk/professions.csv",
                           "columnReference": "name"}}
          ]
        }
      }]
    }"""
    val group = CsvwJson.parseTableGroup(meta)

    val professions = Seq("Operational Delivery", "Finance", "Policy")
      .zipWithIndex.map { case (n, i) => (n, i + 1) }.toDF("name", "rn")
    val senior = Seq(
      ("90115", "Steve Egan", "SCS1A", "Deputy Chief Executive", "90334", "Finance", 1),
      ("90334", "Sir Alan Langlands", "SCS4", "Chief Executive", "xx", "Policy", 2))
      .toDF("ref", "name", "grade", "job", "reportsTo", "profession", "rn")
    val junior = Seq(
      ("90115", "4", "17426", "20002", "Administrator", "8.67", "Operational Delivery", 1),
      ("90115", "5", "19546", "22478", "Administrator", "0.5", "Operational Delivery", 2))
      .toDF("reportsToSenior", "grade", "min_pay", "max_pay", "job", "number", "profession", "rn")

    val bound = Map(
      "http://example.org/gov.uk/professions.csv" -> CsvwPipeline.BoundTable(
        professions, Map.empty, concat(lit("pr"), col("rn")), col("rn"), col("rn")),
      "http://example.org/senior-roles.csv" -> CsvwPipeline.BoundTable(
        senior, Map.empty, concat(lit("sr"), col("rn")), col("rn"), col("rn")),
      "http://example.org/junior-roles.csv" -> CsvwPipeline.BoundTable(
        junior, Map.empty, concat(lit("jr"), col("rn")), col("rn"), col("rn")))
    val res = CsvwPipeline.run(spark, group, bound, CsvwPipeline.Options(minimal = true))
    val got = res.triples
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect().toSet

    // the null-substituted "xx" FK cell collects no reference; everything
    // else resolves, so zero violations across all four FK edges
    assert(res.fkViolations.size == 4)
    assert(res.fkViolations.values.forall(_.count() == 0),
      res.fkViolations.map { case (k, v) => k -> v.collect().toSeq }.toString)
    assert(res.pkViolations.values.forall(_.count() == 0))

    val S = "http://example.org/senior-roles.csv#post-"
    val D = "http://example.org/def/"
    val dc = "http://purl.org/dc/terms/"
    val foaf = "http://xmlns.com/foaf/0.1/"
    val xi = Some("http://www.w3.org/2001/XMLSchema#integer")
    val xd = Some("http://www.w3.org/2001/XMLSchema#double")
    type T = (String, String, String, Boolean, Option[String], Option[String])
    def l(s: String, p: String, o: String, d: Option[String] = None): T = (s, p, o, false, None, d)
    def iri(s: String, p: String, o: String): T = (s, p, o, true, None, None)
    // transcribed from spec/data/roles-minimal.ttl (the reference's fresh
    // bnodes _:d8b8e40c…/_:fa1fa954… are the deterministic _:djr1/_:djr2)
    val expected: Set[T] = Set[T](
      l(S + "90115", dc + "identifier", "90115"),
      l(S + "90115", foaf + "name", "Steve Egan"),
      l(S + "90115", D + "grade", "SCS1A"),
      l(S + "90115", D + "job", "Deputy Chief Executive"),
      iri(S + "90115", D + "reportsTo", S + "90334"),
      l(S + "90115", D + "profession", "Finance"),
      l(S + "90334", dc + "identifier", "90334"),
      l(S + "90334", foaf + "name", "Sir Alan Langlands"),
      l(S + "90334", D + "grade", "SCS4"),
      l(S + "90334", D + "job", "Chief Executive"),
      l(S + "90334", D + "profession", "Policy"),
      iri("_:djr1", D + "reportsTo", S + "90115"),
      l("_:djr1", D + "grade", "4"),
      l("_:djr1", D + "min_pay", "17426", xi),
      l("_:djr1", D + "max_pay", "20002", xi),
      l("_:djr1", D + "job", "Administrator"),
      l("_:djr1", D + "number-of-posts", "8.67", xd),
      l("_:djr1", D + "profession", "Operational Delivery"),
      iri("_:djr2", D + "reportsTo", S + "90115"),
      l("_:djr2", D + "grade", "5"),
      l("_:djr2", D + "min_pay", "19546", xi),
      l("_:djr2", D + "max_pay", "22478", xi),
      l("_:djr2", D + "job", "Administrator"),
      l("_:djr2", D + "number-of-posts", "0.5", xd),
      l("_:djr2", D + "profession", "Operational Delivery"))
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")
  }
}
