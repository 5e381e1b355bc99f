package graft.mapper

import graft.model.CsvwJson
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL-expansion matrix from `/root/reference/spec/metadata_spec.rb:959-1024`:
  * `{#_name}` / `{?_name}` / `{_name}` schema transformations and pname
  * (`schema:{_name}`) templates, checked through the full mapper.
  */
class UrlExpansionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tableFor(about: String, prop: String, value: String) = {
    val json = s"""{
      "url": "https://example.org/countries.csv",
      "aboutUrl": "$about", "propertyUrl": "$prop", "valueUrl": "$value",
      "tableSchema": {"columns": [
        {"titles": "addressCountry"}, {"titles": "latitude"},
        {"titles": "longitude"}, {"titles": "name"}]}}"""
    graft.model.Resolve.group(CsvwJson.parseTableGroup(json)).head
  }

  def run(t: graft.model.ResolvedTable) = {
    val df = Seq(("US", "38.9", "-77.0", "United States")).toDF(
      "addressCountry", "latitude", "longitude", "name").withColumn("rn", lit(1))
    TripleMapper.triples(df, t,
      t.nonVirtual.map(c => c.name -> col(c.name)).toMap,
      col("rn"), col("rn"), col("rn")).as[Triple].collect().toSet
  }

  test("schema transformations: {#_name} / {?_name} / {_name}") {
    val got = run(tableFor("{#_name}", "{?_name}", "{_name}"))
    // aboutUrl resolves fragment against table url; propertyUrl gets ?_name
    // query; valueUrl resolves the bare name document-relative
    assert(got.contains(Triple(
      "https://example.org/countries.csv#addressCountry",
      "https://example.org/countries.csv?_name=addressCountry",
      "https://example.org/addressCountry",
      obj_iri = true, null, null)))
    assert(got.contains(Triple(
      "https://example.org/countries.csv#name",
      "https://example.org/countries.csv?_name=name",
      "https://example.org/name",
      obj_iri = true, null, null)))
    assert(got.size == 4)
  }

  test("pname templates expand via the CSVW context") {
    val got = run(tableFor("http://schema.org/{_name}", "schema:{_name}", "schema:{_name}"))
    assert(got.contains(Triple(
      "http://schema.org/latitude", "http://schema.org/latitude",
      "http://schema.org/latitude", obj_iri = true, null, null)))
    assert(got.size == 4)
  }

  test("default: fresh (deterministic) bnode subject, tableUrl#name predicate") {
    val json = """{
      "url": "https://example.org/countries.csv",
      "tableSchema": {"columns": [{"titles": "addressCountry"}]}}"""
    val t = graft.model.Resolve.group(CsvwJson.parseTableGroup(json)).head
    val df = Seq("US").toDF("addressCountry").withColumn("rn", lit(1))
    val got = TripleMapper.triples(df, t, Map("addressCountry" -> col("addressCountry")),
      col("rn"), col("rn"), col("rn")).as[Triple].collect().toSet
    assert(got == Set(Triple("_:d1",
      "https://example.org/countries.csv#addressCountry", "US",
      obj_iri = false, null, null)))
  }
}
