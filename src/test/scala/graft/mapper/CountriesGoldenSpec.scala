package graft.mapper

import graft.model.{CsvwJson, Resolve}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-group golden parity with the reference's countries fixture
  * (`/root/reference/spec/data/countries.json` + `countries.csv` +
  * `country_slice.csv` → `countries-minimal.ttl`): two tables, cross-table
  * valueUrl IRIs, fragment-form `{#var}` templates, typed doubles that keep
  * their lexical form, gYear, and blank-node subjects for the aboutUrl-less
  * slice table (deterministic skolems here; the reference's fresh bnodes
  * compare via graph isomorphism, which set-equality subsumes once
  * skolemization is fixed).
  */
class CountriesGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("countries two-table group matches countries-minimal.ttl") {
    val meta = """{
      "tables": [{
        "url": "http://example.org/countries.csv",
        "tableSchema": {
          "columns": [
            {"name": "countryCode", "datatype": "string",
             "propertyUrl": "http://www.geonames.org/ontology{#_name}"},
            {"name": "latitude", "datatype": "number"},
            {"name": "longitude", "datatype": "number"},
            {"name": "name", "datatype": "string"}
          ],
          "aboutUrl": "http://example.org/countries.csv{#countryCode}",
          "propertyUrl": "http://schema.org/{_name}",
          "primaryKey": "countryCode"
        }
      }, {
        "url": "http://example.org/country_slice.csv",
        "tableSchema": {
          "columns": [
            {"name": "countryRef",
             "valueUrl": "http://example.org/countries.csv{#countryRef}"},
            {"name": "year", "datatype": "gYear"},
            {"name": "population", "datatype": "integer"}
          ],
          "foreignKeys": [{
            "columnReference": "countryRef",
            "reference": {"resource": "http://example.org/countries.csv",
                          "columnReference": "countryCode"}
          }]
        }
      }]
    }"""
    val group = CsvwJson.parseTableGroup(meta)
    val countries = Seq(
      ("AD", "42.546245", "1.601554", "Andorra", 1),
      ("AE", "23.424076", "53.847818", "United Arab Emirates", 2),
      ("AF", "33.93911", "67.709953", "Afghanistan", 3))
      .toDF("countryCode", "latitude", "longitude", "name", "rn")
    val slice = Seq(
      ("AF", "1960", "9616353", 1),
      ("AF", "1961", "9799379", 2),
      ("AF", "1962", "9989846", 3))
      .toDF("countryRef", "year", "population", "rn")

    val bound = Map(
      "http://example.org/countries.csv" -> CsvwPipeline.BoundTable(
        countries, Map.empty, col("countryCode"), col("rn"), col("rn")),
      "http://example.org/country_slice.csv" -> CsvwPipeline.BoundTable(
        slice, Map.empty, concat(lit("sl"), col("rn")), col("rn"), col("rn")))
    val res = CsvwPipeline.run(spark, group, bound,
      CsvwPipeline.Options(minimal = true))
    val got = res.triples
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect().toSet
    assert(res.fkViolations.values.forall(_.count() == 0))

    val C = "http://example.org/countries.csv#"
    val S = "http://example.org/country_slice.csv#"
    val sch = "http://schema.org/"
    val geo = "http://www.geonames.org/ontology#"
    val xd = Some("http://www.w3.org/2001/XMLSchema#double")
    val xi = Some("http://www.w3.org/2001/XMLSchema#integer")
    val xg = Some("http://www.w3.org/2001/XMLSchema#gYear")
    type T = (String, String, String, Boolean, Option[String], Option[String])
    def lit3(s: String, p: String, o: String, d: Option[String]): T = (s, p, o, false, None, d)
    // transcribed from spec/data/countries-minimal.ttl (bnode subjects
    // replaced by the deterministic skolems _:dsl1.._:dsl3)
    val expected: Set[T] =
      Seq("AD" -> ("42.546245", "1.601554", "Andorra"),
          "AE" -> ("23.424076", "53.847818", "United Arab Emirates"),
          "AF" -> ("33.93911", "67.709953", "Afghanistan")).flatMap {
        case (cc, (lat, lon, nm)) => Seq(
          lit3(C + cc, geo + "countryCode", cc, None),
          lit3(C + cc, sch + "latitude", lat, xd),
          lit3(C + cc, sch + "longitude", lon, xd),
          lit3(C + cc, sch + "name", nm, None))
      }.toSet ++
      Seq(("sl1", "1960", "9616353"), ("sl2", "1961", "9799379"),
          ("sl3", "1962", "9989846")).flatMap { case (sk, yr, pop) => Seq[T](
        (s"_:d$sk", S + "countryRef", C + "AF", true, None, None),
        lit3(s"_:d$sk", S + "year", yr, xg),
        lit3(s"_:d$sk", S + "population", pop, xi))
      }.toSet
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")
  }
}
