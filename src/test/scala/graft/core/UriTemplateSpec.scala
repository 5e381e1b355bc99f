package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RFC 6570 cases (spec examples) + the CSVW URL-expansion matrix shapes from
  * `/root/reference/spec/metadata_spec.rb:959-1024`.
  */
class UriTemplateSpec extends AnyFunSuite {
  val vars: Map[String, Any] = Map(
    "var" -> "value", "hello" -> "Hello World!", "path" -> "/foo/bar",
    "list" -> Seq("red", "green", "blue"), "x" -> "1024", "y" -> "768",
    "empty" -> "")

  def ex(t: String) = UriTemplate.compile(t).expand(vars)

  test("level 1 simple") { assert(ex("{var}") == "value") }
  test("pct-encoding") { assert(ex("{hello}") == "Hello%20World%21") }
  test("reserved +") { assert(ex("{+path}/here") == "/foo/bar/here") }
  test("fragment #") { assert(ex("X{#var}") == "X#value") }
  test("query ?") { assert(ex("{?x,y}") == "?x=1024&y=768") }
  test("continuation &") { assert(ex("?fixed=yes{&x}") == "?fixed=yes&x=1024") }
  test("path /") { assert(ex("{/var,x}/here") == "/value/1024/here") }
  test("dot .") { assert(ex("X{.var}") == "X.value") }
  test("semicolon ;") { assert(ex("{;x,y}") == ";x=1024;y=768") }
  test("list join") { assert(ex("{list}") == "red,green,blue") }
  test("list explode /") { assert(ex("{/list*}") == "/red/green/blue") }
  test("prefix modifier") { assert(ex("{var:3}") == "val") }
  test("undefined skipped") { assert(ex("{undef}") == "") }
  test("undefined in query skipped") { assert(ex("{?undef,x}") == "?x=1024") }
  test("literal passthrough") {
    assert(ex("http://example/{var}/tail") == "http://example/value/tail")
  }
  test("csvw-style aboutUrl") {
    val t = UriTemplate.compile("urn:conv:{conv_id}/turn/{turn_idx}")
    assert(t.expand(Map("conv_id" -> "c1", "turn_idx" -> 7L)) == "urn:conv:c1/turn/7")
  }
  test("csvw _name fragment") {
    val t = UriTemplate.compile("http://example/tbl#{_name}")
    assert(t.expand(Map("_name" -> "country name")) == "http://example/tbl#country%20name")
  }
}

class IriSpec extends AnyFunSuite {
  test("resolve relative") {
    assert(Iri.resolve("http://a/b/c/d;p?q", "g") == "http://a/b/c/g")
    assert(Iri.resolve("http://a/b/c/d;p?q", "./g") == "http://a/b/c/g")
    assert(Iri.resolve("http://a/b/c/d;p?q", "/g") == "http://a/g")
    assert(Iri.resolve("http://a/b/c/d;p?q", "../g") == "http://a/b/g")
    assert(Iri.resolve("http://a/b/c/d;p?q", "#s") == "http://a/b/c/d;p?q#s")
    assert(Iri.resolve("http://a/b/c/d;p?q", "?y") == "http://a/b/c/d;p?y")
    assert(Iri.resolve("http://a/b/c/d;p?q", "") == "http://a/b/c/d;p?q")
    assert(Iri.resolve("http://a/b/c/d;p?q", "g/../h") == "http://a/b/c/h")
  }
  test("absolute kept") {
    assert(Iri.expand("http://base/", "urn:conv:c1") == "urn:conv:c1")
    assert(Iri.expand("http://base/", "https://x/y") == "https://x/y")
  }
  test("prefix expansion") {
    assert(Iri.expand("http://base/", "schema:name") == "http://schema.org/name")
    assert(Iri.expand("http://base/", "dc:title") == "http://purl.org/dc/terms/title")
  }
  test("relative resolved") {
    assert(Iri.expand("http://example/dir/file.csv", "other.csv") == "http://example/dir/other.csv")
    assert(Iri.expand("http://example/tbl.csv", "#frag") == "http://example/tbl.csv#frag")
  }
  test("column name encoding") {
    assert(Iri.encodeColumnName("country name") == "country%20name")
    assert(Iri.encodeColumnName("name") == "name")
    assert(Iri.pctDecode("country%20name") == "country name")
  }
}
