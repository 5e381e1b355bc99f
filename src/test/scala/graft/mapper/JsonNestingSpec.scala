package graft.mapper

import graft.model.{CsvwJson, Resolve}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity for the reference's JSON assembly (`reader.rb:456-637`),
  * lifted from `/root/reference/spec/data/tree-ops-virtual{,-minimal}.json`
  * and `tree-ops-ext{,-minimal}.json` (urls made absolute — base-resolution
  * of metadata discovery is out of scope here; values/structure are the
  * reference's own expected output).
  */
class JsonNestingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()

  test("tree-ops-virtual: aboutUrl grouping, single-ref valueUrl nesting, @type") {
    // metadata from spec/data/tree-ops-virtual.json
    val meta = """{
      "url": "http://example.org/tree-ops.csv",
      "tableSchema": {
        "columns": [
          {"name": "GID", "datatype": "string",
           "propertyUrl": "schema:url", "valueUrl": "#gid-{GID}"},
          {"name": "on_street", "datatype": "string",
           "aboutUrl": "#location-{GID}", "propertyUrl": "schema:streetAddress"},
          {"name": "species", "datatype": "string", "propertyUrl": "schema:name"},
          {"name": "trim_cycle", "datatype": "string"},
          {"name": "inventory_date", "datatype": {"base": "date", "format": "M/d/yyyy"},
           "aboutUrl": "#event-{inventory_date}", "propertyUrl": "schema:startDate"},
          {"propertyUrl": "schema:event", "valueUrl": "#event-{inventory_date}", "virtual": true},
          {"propertyUrl": "schema:location", "valueUrl": "#location-{GID}", "virtual": true},
          {"aboutUrl": "#location-{GID}", "propertyUrl": "rdf:type",
           "valueUrl": "schema:PostalAddress", "virtual": true}
        ],
        "aboutUrl": "#gid-{GID}"
      }
    }"""
    val t = Resolve.group(CsvwJson.parseTableGroup(meta)).head
    // rows from spec/data/tree-ops.csv
    val df = Seq(
      ("1", "ADDISON AV", "Celtis australis", "Large Tree Routine Prune", "10/18/2010", 1),
      ("2", "EMERSON ST", "Liquidambar styraciflua", "Large Tree Routine Prune", "6/2/2010", 2))
      .toDF("GID", "on_street", "species", "trim_cycle", "inventory_date", "rn")
    val got = JsonOutput.minimalRows(df, t,
        t.nonVirtual.map(c => c.name -> col(c.name)).toMap,
        col("GID"), col("rn"), col("rn"))
      .as[String].collect().map(mapper.readTree).sortBy(_.get("@id").asText())

    // expected output from spec/data/tree-ops-virtual-minimal.json
    val expected = mapper.readTree("""[
      {
        "@id": "http://example.org/tree-ops.csv#gid-1",
        "schema:url": "http://example.org/tree-ops.csv#gid-1",
        "schema:name": "Celtis australis",
        "trim_cycle": "Large Tree Routine Prune",
        "schema:event": {
          "@id": "http://example.org/tree-ops.csv#event-2010-10-18",
          "schema:startDate": "2010-10-18"
        },
        "schema:location": {
          "@id": "http://example.org/tree-ops.csv#location-1",
          "schema:streetAddress": "ADDISON AV",
          "@type": "schema:PostalAddress"
        }
      },
      {
        "@id": "http://example.org/tree-ops.csv#gid-2",
        "schema:url": "http://example.org/tree-ops.csv#gid-2",
        "schema:name": "Liquidambar styraciflua",
        "trim_cycle": "Large Tree Routine Prune",
        "schema:event": {
          "@id": "http://example.org/tree-ops.csv#event-2010-06-02",
          "schema:startDate": "2010-06-02"
        },
        "schema:location": {
          "@id": "http://example.org/tree-ops.csv#location-2",
          "schema:streetAddress": "EMERSON ST",
          "@type": "schema:PostalAddress"
        }
      }
    ]""")
    assert(got.length == 2)
    assert(got(0) == expected.get(0), s"row 1:\n${got(0)}\nvs\n${expected.get(0)}")
    assert(got(1) == expected.get(1), s"row 2:\n${got(1)}\nvs\n${expected.get(1)}")
  }

  test("tree-ops-ext: typed values, lists keep spaces, defaults, suppressed columns") {
    // metadata from spec/data/tree-ops-ext.json (url made absolute)
    val meta = """{
      "url": "http://example.org/tree-ops-ext",
      "tableSchema": {
        "columns": [
          {"name": "GID", "datatype": "string", "required": true, "suppressOutput": true},
          {"name": "on_street", "datatype": "string"},
          {"name": "species", "datatype": "string"},
          {"name": "trim_cycle", "datatype": "string", "lang": "en"},
          {"name": "dbh", "datatype": "integer"},
          {"name": "inventory_date", "datatype": {"base": "date", "format": "M/d/yyyy"}},
          {"name": "comments", "datatype": "string", "separator": ";"},
          {"name": "protected", "datatype": {"base": "boolean", "format": "YES|NO"}, "default": "NO"},
          {"name": "kml", "datatype": "xml"}
        ],
        "primaryKey": "GID",
        "aboutUrl": "http://example.org/tree-ops-ext#gid-{GID}"
      }
    }"""
    val t = Resolve.group(CsvwJson.parseTableGroup(meta)).head
    // rows 1 and 6 from spec/data/tree-ops-ext.csv
    val df = Seq(
      ("1", "ADDISON AV", "Celtis australis", "Large Tree Routine Prune", "11", "10/18/2010",
        "", "", "<Point><coordinates>-122.156485,37.440963</coordinates></Point>", 1),
      ("6", "ADDISON AV", "Robinia pseudoacacia", "Large Tree Routine Prune", "29", "6/1/2010",
        "cavity or decay; trunk decay; codominant leaders; included bark; large leader or limb decay; previous failure root damage; root decay;  beware of BEES",
        "YES", "<Point><coordinates>-122.156299,37.441151</coordinates></Point>", 2))
      .toDF("GID", "on_street", "species", "trim_cycle", "dbh", "inventory_date",
        "comments", "protected", "kml", "rn")
    val got = JsonOutput.minimalRows(df, t,
        t.nonVirtual.map(c => c.name -> col(c.name)).toMap,
        col("GID"), col("rn"), col("rn"))
      .as[String].collect().map(mapper.readTree).sortBy(_.get("@id").asText())

    // expected from spec/data/tree-ops-ext-minimal.json rows 1 and 3
    val expected = mapper.readTree("""[
      {
        "@id": "http://example.org/tree-ops-ext#gid-1",
        "on_street": "ADDISON AV",
        "species": "Celtis australis",
        "trim_cycle": "Large Tree Routine Prune",
        "dbh": 11,
        "inventory_date": "2010-10-18",
        "protected": false,
        "kml": "<Point><coordinates>-122.156485,37.440963</coordinates></Point>"
      },
      {
        "@id": "http://example.org/tree-ops-ext#gid-6",
        "on_street": "ADDISON AV",
        "species": "Robinia pseudoacacia",
        "trim_cycle": "Large Tree Routine Prune",
        "dbh": 29,
        "inventory_date": "2010-06-01",
        "comments": [
          "cavity or decay",
          " trunk decay",
          " codominant leaders",
          " included bark",
          " large leader or limb decay",
          " previous failure root damage",
          " root decay",
          "  beware of BEES"
        ],
        "protected": true,
        "kml": "<Point><coordinates>-122.156299,37.441151</coordinates></Point>"
      }
    ]""")
    assert(got.length == 2)
    assert(got(0) == expected.get(0), s"row 1:\n${got(0)}\nvs\n${expected.get(0)}")
    assert(got(1) == expected.get(1), s"row 6:\n${got(1)}\nvs\n${expected.get(1)}")
  }

  test("valueUrl referenced twice is NOT nested (count != 1)") {
    val meta = """{
      "url": "http://example.org/t",
      "tableSchema": {
        "columns": [
          {"name": "id", "datatype": "string", "suppressOutput": true},
          {"name": "a", "datatype": "string", "aboutUrl": "#child-{id}"},
          {"propertyUrl": "#ref1", "valueUrl": "#child-{id}", "virtual": true},
          {"propertyUrl": "#ref2", "valueUrl": "#child-{id}", "virtual": true}
        ],
        "aboutUrl": "#root-{id}"
      }
    }"""
    val t = Resolve.group(CsvwJson.parseTableGroup(meta)).head
    val df = Seq(("1", "x", 1)).toDF("id", "a", "rn")
    val got = JsonOutput.minimalRows(df, t,
        t.nonVirtual.map(c => c.name -> col(c.name)).toMap,
        col("id"), col("rn"), col("rn"))
      .as[String].collect().map(mapper.readTree)
    // two references -> the child object stays a separate describes entry
    // and both properties keep the IRI string
    assert(got.length == 2)
    val root = got.find(_.get("@id").asText().contains("root")).get
    assert(root.get("http://example.org/t#ref1").asText() == "http://example.org/t#child-1")
    assert(root.get("http://example.org/t#ref2").asText() == "http://example.org/t#child-1")
  }
}
