package graft.mapper

import graft.model.CsvwJson
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** FIXTURES.md §2.2 "full mapping" over the transcript shape, checked against
  * hand-computed triples (analog of the reference golden-file tests,
  * `/root/reference/spec/reader_spec.rb:156-265`).
  */
class TripleMapperSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val mappingJson = """{
    "url": "http://example.org/transcripts",
    "tableSchema": {
      "aboutUrl": "urn:conv:{conv_id}/turn/{turn_idx}",
      "propertyUrl": "https://example.org/transcript#{_name}",
      "primaryKey": ["conv_id", "turn_idx"],
      "columns": [
        {"name": "conv_id", "datatype": "string"},
        {"name": "turn_idx", "datatype": "integer"},
        {"name": "role", "datatype": "string"},
        {"name": "text", "datatype": "string"},
        {"name": "tool", "datatype": "string", "null": [""]},
        {"name": "ts", "datatype": {"base": "dateTime"}}
      ]
    }
  }"""

  lazy val table = graft.model.Resolve.group(CsvwJson.parseTableGroup(mappingJson)).head

  def transcripts = Seq(
    ("c1", 0, "user", "hello", "", "2024-01-01T00:00:00"),
    ("c1", 1, "assistant", "hi there", "search", "2024-01-01T00:00:05"),
    ("c2", 0, "user", "  padded  ", "", "2024-01-02T10:00:00"))
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  def run(minimal: Boolean) = TripleMapper.triples(
    transcripts, table,
    inputs = table.nonVirtual.map(c => c.name -> col(c.name)).toMap,
    skolem = concat($"conv_id", lit("-"), $"turn_idx"),
    rownum = $"turn_idx" + 1,
    sourceNum = $"turn_idx" + 2,
    minimal = minimal)

  test("minimal mode emits expected entity triples") {
    val got = run(minimal = true).as[Triple].collect().toSet
    val P = "https://example.org/transcript#"
    val X = "http://www.w3.org/2001/XMLSchema#"
    def about(c: String, t: Int) = s"urn:conv:$c/turn/$t"
    val expected = Set(
      Triple(about("c1", 0), P + "conv_id", "c1", obj_iri = false, null, null),
      Triple(about("c1", 0), P + "turn_idx", "0", obj_iri = false, null, X + "integer"),
      Triple(about("c1", 0), P + "role", "user", obj_iri = false, null, null),
      Triple(about("c1", 0), P + "text", "hello", obj_iri = false, null, null),
      Triple(about("c1", 0), P + "ts", "2024-01-01T00:00:00", obj_iri = false, null, X + "dateTime"),
      Triple(about("c1", 1), P + "conv_id", "c1", obj_iri = false, null, null),
      Triple(about("c1", 1), P + "turn_idx", "1", obj_iri = false, null, X + "integer"),
      Triple(about("c1", 1), P + "role", "assistant", obj_iri = false, null, null),
      Triple(about("c1", 1), P + "text", "hi there", obj_iri = false, null, null),
      Triple(about("c1", 1), P + "tool", "search", obj_iri = false, null, null),
      Triple(about("c1", 1), P + "ts", "2024-01-01T00:00:05", obj_iri = false, null, X + "dateTime"),
      Triple(about("c2", 0), P + "conv_id", "c2", obj_iri = false, null, null),
      Triple(about("c2", 0), P + "turn_idx", "0", obj_iri = false, null, X + "integer"),
      Triple(about("c2", 0), P + "role", "user", obj_iri = false, null, null),
      // string datatype keeps raw value unstripped (metadata.rb:2077-2078)
      Triple(about("c2", 0), P + "text", "  padded  ", obj_iri = false, null, null),
      Triple(about("c2", 0), P + "ts", "2024-01-02T10:00:00", obj_iri = false, null, X + "dateTime"))
    assert(got == expected)
  }

  test("standard mode adds row boilerplate + describes") {
    val got = run(minimal = false).as[Triple].collect().toSet
    val C = "http://www.w3.org/ns/csvw#"
    // 16 entity triples + per-row csvw:row/rownum/type/url + 1 describes per
    // row (all cells share the row's aboutUrl, so describes dedupes in a set)
    assert(got.size == 16 + 3 * 4 + 3)
    assert(got.contains(Triple("_:rc1-0", C + "rownum", "1", obj_iri = false, null,
      "http://www.w3.org/2001/XMLSchema#integer")))
    assert(got.contains(Triple("_:table1", C + "row", "_:rc1-0", obj_iri = true, null, null)))
    assert(got.contains(Triple("_:rc1-0", C + "url",
      "http://example.org/transcripts#row=2", obj_iri = true, null, null)))
    assert(got.contains(Triple("_:rc1-0", C + "describes", "urn:conv:c1/turn/0",
      obj_iri = true, null, null)))
  }

  test("list + ordered columns emit rdf:List cons chains") {
    val json = """{
      "url": "http://example.org/t",
      "tableSchema": {
        "aboutUrl": "urn:row:{_row}",
        "columns": [
          {"name": "tags", "separator": ";", "ordered": true, "datatype": "string"},
          {"name": "unordered", "separator": ";", "datatype": "integer"}
        ]
      }
    }"""
    val t = graft.model.Resolve.group(CsvwJson.parseTableGroup(json)).head
    val df = Seq(("a;b;c", "1;2"), ("", "")).toDF("tags", "unordered")
      .withColumn("rn", monotonically_increasing_id() + 1)
    val got = TripleMapper.triples(df, t,
      inputs = Map("tags" -> col("tags"), "unordered" -> col("unordered")),
      skolem = col("rn"), rownum = col("rn"), sourceNum = col("rn")).as[Triple].collect().toSet
    val R = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val X = "http://www.w3.org/2001/XMLSchema#"
    assert(got.contains(Triple("urn:row:1", "http://example.org/t#tags", "_:l1.tags.0", obj_iri = true, null, null)))
    assert(got.contains(Triple("_:l1.tags.0", R + "first", "a", obj_iri = false, null, null)))
    assert(got.contains(Triple("_:l1.tags.0", R + "rest", "_:l1.tags.1", obj_iri = true, null, null)))
    assert(got.contains(Triple("_:l1.tags.2", R + "rest", R + "nil", obj_iri = true, null, null)))
    // unordered separator column: one triple per element, typed
    assert(got.contains(Triple("urn:row:1", "http://example.org/t#unordered", "1", obj_iri = false, null, X + "integer")))
    assert(got.contains(Triple("urn:row:1", "http://example.org/t#unordered", "2", obj_iri = false, null, X + "integer")))
    // empty ordered list → rdf:nil object; empty unordered → no triples
    assert(got.contains(Triple("urn:row:2", "http://example.org/t#tags", R + "nil", obj_iri = true, null, null)))
    assert(!got.exists(t2 => t2.subj == "urn:row:2" && t2.pred.endsWith("#unordered")))
  }

  test("valueUrl produces IRI objects and is skipped for null cells") {
    val json = """{
      "url": "http://example.org/t",
      "tableSchema": {
        "aboutUrl": "urn:row:{_row}",
        "columns": [
          {"name": "code", "datatype": "string", "null": [""],
           "valueUrl": "http://example.org/code/{code}"}
        ]
      }
    }"""
    val t = graft.model.Resolve.group(CsvwJson.parseTableGroup(json)).head
    val df = Seq("gb", "").toDF("code").withColumn("rn", monotonically_increasing_id() + 1)
    val got = TripleMapper.triples(df, t, Map("code" -> col("code")),
      col("rn"), col("rn"), col("rn")).as[Triple].collect().toSet
    assert(got == Set(Triple("urn:row:1", "http://example.org/t#code",
      "http://example.org/code/gb", obj_iri = true, null, null)))
  }

  test("language-tagged strings carry lang") {
    val json = """{
      "url": "http://example.org/t",
      "tableSchema": {
        "aboutUrl": "urn:row:{_row}",
        "columns": [{"name": "title", "datatype": "string", "lang": "en"}]
      }
    }"""
    val t = graft.model.Resolve.group(CsvwJson.parseTableGroup(json)).head
    val df = Seq("hello").toDF("title").withColumn("rn", lit(1))
    val got = TripleMapper.triples(df, t, Map("title" -> col("title")),
      col("rn"), col("rn"), col("rn")).as[Triple].collect().toSet
    assert(got == Set(Triple("urn:row:1", "http://example.org/t#title", "hello",
      obj_iri = false, "en", null)))
  }

  test("invalid typed values degrade to plain literal + error side-channel") {
    val json = """{
      "url": "http://example.org/t",
      "tableSchema": {
        "aboutUrl": "urn:row:{_row}",
        "columns": [{"name": "n", "datatype": "integer"}]
      }
    }"""
    val t = graft.model.Resolve.group(CsvwJson.parseTableGroup(json)).head
    val df = Seq("42", "notanumber").toDF("n").withColumn("rn", monotonically_increasing_id() + 1)
    val got = TripleMapper.triples(df, t, Map("n" -> col("n")),
      col("rn"), col("rn"), col("rn")).as[Triple].collect().toSet
    assert(got.contains(Triple("urn:row:1", "http://example.org/t#n", "42",
      obj_iri = false, null, "http://www.w3.org/2001/XMLSchema#integer")))
    assert(got.contains(Triple("urn:row:2", "http://example.org/t#n", "notanumber",
      obj_iri = false, null, null)))
    val errs = TripleMapper.cellErrors(df, t, Map("n" -> col("n")), col("rn")).collect()
    assert(errs.length == 1 && errs(0).getString(1) == "n")
  }
}
