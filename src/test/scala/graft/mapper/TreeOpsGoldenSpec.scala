package graft.mapper

import graft.model.{CsvwJson, Resolve}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden RDF parity with the reference's tree-ops fixture
  * (`/root/reference/spec/data/tree-ops.csv-metadata.json` +
  * `tree-ops.csv` rows 1-2 → `tree-ops-minimal.ttl`), compared as an exact
  * triple set.
  */
class TreeOpsGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tree-ops minimal mode matches tree-ops-minimal.ttl exactly") {
    val meta = """{
      "url": "http://example.org/tree-ops.csv",
      "tableSchema": {
        "columns": [
          {"name": "GID", "titles": ["GID", "Generic Identifier"], "datatype": "string", "required": true},
          {"name": "on_street", "titles": "On Street", "datatype": "string"},
          {"name": "species", "titles": "Species", "datatype": "string"},
          {"name": "trim_cycle", "titles": "Trim Cycle", "datatype": "string"},
          {"name": "inventory_date", "titles": "Inventory Date",
           "datatype": {"base": "date", "format": "M/d/yyyy"}}
        ],
        "primaryKey": "GID",
        "aboutUrl": "#gid-{GID}"
      }
    }"""
    val t = Resolve.group(CsvwJson.parseTableGroup(meta)).head
    val df = Seq(
      ("1", "ADDISON AV", "Celtis australis", "Large Tree Routine Prune", "10/18/2010", 1),
      ("2", "EMERSON ST", "Liquidambar styraciflua", "Large Tree Routine Prune", "6/2/2010", 2))
      .toDF("GID", "on_street", "species", "trim_cycle", "inventory_date", "rn")
    val got = TripleMapper.triples(df, t,
        t.nonVirtual.map(c => c.name -> col(c.name)).toMap,
        skolem = col("GID"), rownum = col("rn"), sourceNum = col("rn"),
        minimal = true)
      .as[(String, String, String, Boolean, Option[String], Option[String])]
      .collect().toSet

    val P = "http://example.org/tree-ops.csv#"
    val xd = Some("http://www.w3.org/2001/XMLSchema#date")
    def lit(s: String, p: String, o: String, d: Option[String] = None)
        : (String, String, String, Boolean, Option[String], Option[String]) =
      (P + s, P + p, o, false, None, d)
    // transcribed from spec/data/tree-ops-minimal.ttl
    val expected = Set(
      lit("gid-1", "GID", "1"),
      lit("gid-1", "inventory_date", "2010-10-18", xd),
      lit("gid-1", "on_street", "ADDISON AV"),
      lit("gid-1", "species", "Celtis australis"),
      lit("gid-1", "trim_cycle", "Large Tree Routine Prune"),
      lit("gid-2", "GID", "2"),
      lit("gid-2", "inventory_date", "2010-06-02", xd),
      lit("gid-2", "on_street", "EMERSON ST"),
      lit("gid-2", "species", "Liquidambar styraciflua"),
      lit("gid-2", "trim_cycle", "Large Tree Routine Prune"))
    assert(got == expected, s"diff: extra=${got -- expected} missing=${expected -- got}")
  }
}
