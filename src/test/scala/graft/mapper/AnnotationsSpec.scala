package graft.mapper

import graft.model.CsvwJson
import org.scalatest.funsuite.AnyFunSuite

class AnnotationsSpec extends AnyFunSuite {

  test("common properties captured by parser and expanded to triples") {
    val tg = CsvwJson.parseTableGroup("""{
      "url": "http://e/t.csv",
      "dc:title": "My table",
      "dc:creator": {"@value": "Alice", "@language": "en"},
      "schema:about": {"@id": "http://e/topic", "schema:name": "Topic"},
      "notes": ["a note"],
      "tableSchema": {"columns": [{"name": "x"}]}}""")
    val common = tg.tables.head.common.toMap
    assert(common.contains("dc:title") && common.contains("notes"))

    val trs = common.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Annotations.commonProperty("_:t1", k, v, "seed")
    }
    assert(trs.contains(Triple("_:t1", "http://purl.org/dc/terms/title", "My table",
      obj_iri = false, null, null)))
    assert(trs.contains(Triple("_:t1", "http://purl.org/dc/terms/creator", "Alice",
      obj_iri = false, "en", null)))
    assert(trs.contains(Triple("_:t1", "http://schema.org/about", "http://e/topic",
      obj_iri = true, null, null)))
    assert(trs.contains(Triple("http://e/topic", "http://schema.org/name", "Topic",
      obj_iri = false, null, null)))
    assert(trs.contains(Triple("_:t1", "http://www.w3.org/ns/csvw#note", "a note",
      obj_iri = false, null, null)))
  }

  test("typed and numeric common-property values") {
    val trs = Annotations.commonProperty("_:t", "dc:extent",
      """{"@value": "42", "@type": "xsd:integer"}""", "s")
    assert(trs == Seq(Triple("_:t", "http://purl.org/dc/terms/extent", "42",
      obj_iri = false, null, "http://www.w3.org/2001/XMLSchema#integer")))
    val num = Annotations.commonProperty("_:t", "schema:version", "7", "s")
    assert(num.head.dtype.endsWith("integer") && num.head.obj == "7")
  }

  test("provenance activity shape") {
    val trs = Annotations.provenance("_:tg", Seq("http://e/t.csv"),
      Seq("http://e/meta.json"), "2024-01-01T00:00:00Z", "2024-01-01T00:00:01Z")
    val P = "http://www.w3.org/ns/prov#"
    assert(trs.contains(Triple("_:tg", P + "wasGeneratedBy", "_:prov_activity",
      obj_iri = true, null, null)))
    assert(trs.count(_.pred == P + "qualifiedUsage") == 2)
    assert(trs.exists(t => t.pred == P + "hadRole" &&
      t.obj == "http://www.w3.org/ns/csvw#csvEncodedTabularData"))
    assert(trs.exists(t => t.pred == P + "startedAtTime" &&
      t.dtype == "http://www.w3.org/2001/XMLSchema#dateTime"))
  }
}
