package graft.mapper

import graft.model.CsvwJson

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with the reference's tree-ops-ext fixture
  * (`/root/reference/spec/data/tree-ops-ext.json` →
  * `tree-ops-ext-minimal.ttl`): a suppressed-output key column still driving
  * the aboutUrl, a language-tagged column (`lang: "en"` → `@en` literals),
  * separator-split list values that keep their post-split inner whitespace,
  * a boolean with `format: YES|NO` + `default: "NO"` canonicalizing to
  * true/false, an `xml` datatype emitting rdf:XMLLiteral, and the
  * `M/d/yyyy` date format.
  */
class TreeOpsExtGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tree-ops-ext matches tree-ops-ext-minimal.ttl") {
    val meta = """{
      "url": "http://example.org/tree-ops-ext.csv",
      "dialect": {"trim": true},
      "tableSchema": {
        "columns": [
          {"name": "GID", "titles": ["GID", "Generic Identifier"],
           "datatype": "string", "required": true, "suppressOutput": true},
          {"name": "on_street", "titles": "On Street", "datatype": "string"},
          {"name": "species", "titles": "Species", "datatype": "string"},
          {"name": "trim_cycle", "titles": "Trim Cycle", "datatype": "string",
           "lang": "en"},
          {"name": "dbh", "titles": "Diameter at Breast Ht", "datatype": "integer"},
          {"name": "inventory_date", "titles": "Inventory Date",
           "datatype": {"base": "date", "format": "M/d/yyyy"}},
          {"name": "comments", "titles": "Comments", "datatype": "string",
           "separator": ";"},
          {"name": "protected", "titles": "Protected",
           "datatype": {"base": "boolean", "format": "YES|NO"}, "default": "NO"},
          {"name": "kml", "titles": "KML", "datatype": "xml"}
        ],
        "primaryKey": "GID",
        "aboutUrl": "http://example.org/tree-ops-ext#gid-{GID}"
      }
    }"""
    val table = graft.model.Resolve.group(CsvwJson.parseTableGroup(meta)).head
    val comments6 = "cavity or decay; trunk decay; codominant leaders; included bark;" +
      " large leader or limb decay; previous failure root damage; root decay;  beware of BEES"
    val df = Seq(
      ("1", "ADDISON AV", "Celtis australis", "Large Tree Routine Prune", "11",
        "10/18/2010", "", "", "<Point><coordinates>-122.156485,37.440963</coordinates></Point>", 1),
      ("2", "EMERSON ST", "Liquidambar styraciflua", "Large Tree Routine Prune", "11",
        "6/2/2010", "", "", "<Point><coordinates>-122.156749,37.440958</coordinates></Point>", 2),
      ("6", "ADDISON AV", "Robinia pseudoacacia", "Large Tree Routine Prune", "29",
        "6/1/2010", comments6, "YES", "<Point><coordinates>-122.156299,37.441151</coordinates></Point>", 3))
      .toDF("GID", "on_street", "species", "trim_cycle", "dbh",
        "inventory_date", "comments", "protected", "kml", "rn")
    val got = TripleMapper.triples(df, table,
      table.nonVirtual.map(c => c.name -> col(c.name)).toMap,
      skolem = col("rn"), rownum = col("rn"), sourceNum = col("rn"))
      .as[Triple].collect().toSet

    val C = "http://example.org/tree-ops-ext.csv#"
    def G(gid: String) = s"http://example.org/tree-ops-ext#gid-$gid"
    val xi = "http://www.w3.org/2001/XMLSchema#integer"
    val xdt = "http://www.w3.org/2001/XMLSchema#date"
    val xb = "http://www.w3.org/2001/XMLSchema#boolean"
    val xml = "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"
    def lit3(s: String, p: String, o: String, d: String = null, lang: String = null): Triple =
      Triple(s, p, o, obj_iri = false, lang, d)
    // transcribed from spec/data/tree-ops-ext-minimal.ttl: GID suppressed,
    // empty comments emit nothing, empty protected defaults NO → "false",
    // split comments keep their inner whitespace
    val expected = Seq(
      ("1", "ADDISON AV", "Celtis australis", "11", "2010-10-18", "false",
        "<Point><coordinates>-122.156485,37.440963</coordinates></Point>"),
      ("2", "EMERSON ST", "Liquidambar styraciflua", "11", "2010-06-02", "false",
        "<Point><coordinates>-122.156749,37.440958</coordinates></Point>"),
      ("6", "ADDISON AV", "Robinia pseudoacacia", "29", "2010-06-01", "true",
        "<Point><coordinates>-122.156299,37.441151</coordinates></Point>")).flatMap {
      case (gid, street, species, dbh, date, prot, kml) => Seq(
        lit3(G(gid), C + "on_street", street),
        lit3(G(gid), C + "species", species),
        lit3(G(gid), C + "trim_cycle", "Large Tree Routine Prune", lang = "en"),
        lit3(G(gid), C + "dbh", dbh, xi),
        lit3(G(gid), C + "inventory_date", date, xdt),
        lit3(G(gid), C + "protected", prot, xb),
        lit3(G(gid), C + "kml", kml, xml))
    }.toSet ++ Seq(
      "cavity or decay", " trunk decay", " codominant leaders", " included bark",
      " large leader or limb decay", " previous failure root damage",
      " root decay", "  beware of BEES")
      .map(c => lit3(G("6"), C + "comments", c)).toSet
    assert(got == expected, s"extra=${got -- expected}\nmissing=${expected -- got}")
  }
}
