package graft.mapper

import graft.model.CsvwJson

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with the reference's tree-ops-virtual fixture
  * (`/root/reference/spec/data/tree-ops-virtual.json` →
  * `tree-ops-virtual-minimal.ttl`): virtual columns fan each row out to
  * THREE subjects (#gid-, #location-, #event-), template variables bind the
  * CONVERTED cell value (the `M/d/yyyy` date expands as its canonical
  * `2010-10-18` form in `#event-{inventory_date}`), rdf:type emission via a
  * virtual column's valueUrl pname, and a default `tableUrl#column`
  * predicate for the propertyUrl-less trim_cycle.
  */
class TreeOpsVirtualGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tree-ops-virtual matches tree-ops-virtual-minimal.ttl") {
    val meta = """{
      "url": "http://example.org/tree-ops.csv",
      "tableSchema": {
        "columns": [
          {"name": "GID", "titles": "GID", "datatype": "string",
           "propertyUrl": "schema:url", "valueUrl": "#gid-{GID}"},
          {"name": "on_street", "titles": "On Street", "datatype": "string",
           "aboutUrl": "#location-{GID}", "propertyUrl": "schema:streetAddress"},
          {"name": "species", "titles": "Species", "datatype": "string",
           "propertyUrl": "schema:name"},
          {"name": "trim_cycle", "titles": "Trim Cycle", "datatype": "string"},
          {"name": "inventory_date", "titles": "Inventory Date",
           "datatype": {"base": "date", "format": "M/d/yyyy"},
           "aboutUrl": "#event-{inventory_date}", "propertyUrl": "schema:startDate"},
          {"propertyUrl": "schema:event", "valueUrl": "#event-{inventory_date}",
           "virtual": true},
          {"propertyUrl": "schema:location", "valueUrl": "#location-{GID}",
           "virtual": true},
          {"aboutUrl": "#location-{GID}", "propertyUrl": "rdf:type",
           "valueUrl": "schema:PostalAddress", "virtual": true}
        ],
        "aboutUrl": "#gid-{GID}"
      }
    }"""
    val table = graft.model.Resolve.group(CsvwJson.parseTableGroup(meta)).head
    val df = Seq(
      ("1", "ADDISON AV", "Celtis australis", "Large Tree Routine Prune", "10/18/2010", 1),
      ("2", "EMERSON ST", "Liquidambar styraciflua", "Large Tree Routine Prune", "6/2/2010", 2))
      .toDF("GID", "on_street", "species", "trim_cycle", "inventory_date", "rn")
    val got = TripleMapper.triples(df, table,
      table.nonVirtual.map(c => c.name -> col(c.name)).toMap,
      skolem = col("rn"), rownum = col("rn"), sourceNum = col("rn"))
      .as[Triple].collect().toSet

    val U = "http://example.org/tree-ops.csv#"
    val sch = "http://schema.org/"
    val xd = "http://www.w3.org/2001/XMLSchema#date"
    def lit3(s: String, p: String, o: String, d: String = null): Triple =
      Triple(s, p, o, obj_iri = false, null, d)
    def iri(s: String, p: String, o: String): Triple =
      Triple(s, p, o, obj_iri = true, null, null)
    // transcribed from spec/data/tree-ops-virtual-minimal.ttl
    val expected = Seq(
      ("1", "ADDISON AV", "Celtis australis", "2010-10-18"),
      ("2", "EMERSON ST", "Liquidambar styraciflua", "2010-06-02")).flatMap {
      case (gid, street, species, date) => Seq(
        iri(s"${U}gid-$gid", sch + "url", s"${U}gid-$gid"),
        lit3(s"${U}location-$gid", sch + "streetAddress", street),
        lit3(s"${U}gid-$gid", sch + "name", species),
        lit3(s"${U}gid-$gid", s"${U}trim_cycle", "Large Tree Routine Prune"),
        lit3(s"${U}event-$date", sch + "startDate", date, xd),
        iri(s"${U}gid-$gid", sch + "event", s"${U}event-$date"),
        iri(s"${U}gid-$gid", sch + "location", s"${U}location-$gid"),
        iri(s"${U}location-$gid", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            sch + "PostalAddress"))
    }.toSet
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")
  }
}
