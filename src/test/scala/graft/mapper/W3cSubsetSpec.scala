package graft.mapper

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** File-driven manifest suite over the vendored fixtures in
  * `src/test/resources/w3c-subset` — the same machinery shape as the
  * reference's W3C suite runner (`/root/reference/spec/suite_spec.rb:12-83`:
  * manifest entries dispatched by test type to RDF / JSON / validation
  * checks). The official csvw-tests checkout is unavailable offline (the
  * reference's own CI skips the suite, `suite_spec.rb:84`), so the
  * manifest here carries original spec-derived fixtures named after the
  * manifest families they mirror; every entry runs through the full
  * production entry point ([[CsvwReader.open]]).
  */
class W3cSubsetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Base = "http://example.org/w3c/"
  private val dir: Path =
    Paths.get(getClass.getResource("/w3c-subset/manifest.json").toURI).getParent

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Jackson trees → Scala structures with numeric canonicalization
    * (IntNode(1) must equal LongNode(1)); mirrors SuiteGoldenSpec. */
  private def norm(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isObject) n.properties().asScala.map(e => e.getKey -> norm(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(norm).toList
    else if (n.isNumber) BigDecimal(n.decimalValue()).underlying.stripTrailingZeros
    else if (n.isTextual) n.asText()
    else if (n.isBoolean) n.asBoolean()
    else null

  private def open(action: String, minimal: Boolean, validate: Boolean = false) =
    CsvwReader.open(spark, dir.resolve(action).toString, Base + action,
      minimal = minimal, validate = validate)

  private def tripleSet(action: String, minimal: Boolean): Set[Triple] = {
    import spark.implicits._
    open(action, minimal).result.triples
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect().toSet
      .map((t: (String, String, String, Boolean, Option[String], Option[String])) =>
        Triple(t._1, t._2, t._3, t._4, t._5.orNull, t._6.orNull))
  }

  private val manifest = mapper.readTree(Files.readString(dir.resolve("manifest.json")))

  manifest.get("entries").elements().asScala.toList.foreach { e =>
    val id = e.get("id").asText
    val typ = e.get("type").asText
    val action = e.get("action").asText
    val minimal = Option(e.get("minimal")).exists(_.asBoolean)
    val result = Option(e.get("result")).map(_.asText)

    test(s"$id: ${e.get("name").asText} [$typ]") {
      typ match {
        case "ToRdfTest" =>
          val got = tripleSet(action, minimal)
          val want = TurtleLite.parse(
            Files.readString(dir.resolve(result.get)), Base + action)
          assert(TurtleLite.isomorphic(got, want),
            s"\n=== $id ===\n" + TurtleLite.diff(got, want))

        case "ToJsonTest" =>
          val got = mapper.readTree(CsvwReader.jsonDocument(open(action, minimal), minimal))
          val want = mapper.readTree(Files.readString(dir.resolve(result.get)))
          assert(norm(got) == norm(want),
            s"\n=== $id ===\ngot:  $got\nwant: $want")

        case "PositiveValidationTest" =>
          try open(action, minimal = true, validate = true).result.raiseOnErrors()
          catch { case ex: Exception => fail(s"expected clean validation: $ex") }

        case "NegativeValidationTest" =>
          val ex = intercept[Exception] {
            open(action, minimal = true, validate = true).result.raiseOnErrors()
          }
          assert(ex.getMessage.contains("Errors found during processing"), ex.getMessage)
          // the raise must be for the entry's documented reason (e.g. a
          // pk_violation_error), not an incidental metadata-compat error
          Option(e.get("errorContains")).map(_.asText).foreach { frag =>
            assert(ex.getMessage.contains(frag), ex.getMessage)
          }

        case "NegativeRdfTest" =>
          intercept[Exception] {
            tripleSet(action, minimal = true)
          }

        case "NegativeJsonTest" =>
          // the reference's suite shape: `expect {reader.to_json}.to
          // raise_error` (`suite_spec.rb:68`) — generation, not validation,
          // must fail on a structurally invalid metadata document
          intercept[Exception] {
            CsvwReader.jsonDocument(open(action, minimal = true), minimal = true)
          }

        case other => fail(s"unknown manifest entry type $other")
      }
    }
  }
}
