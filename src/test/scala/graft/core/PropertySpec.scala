package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5): URI-template encoding laws, IRI resolution
  * invariants, UAX-35 canonical-form idempotence. Seeded sampling (no
  * scalatest-scalacheck bridge in the offline cache), 500 cases per law.
  */
class UriTemplatePropertySpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private val unreservedChars =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~')).toArray
  private val anyChars =
    (('a' to 'z') ++ Seq(' ', '/', '?', '#', '&', '=', '%', 'é', '中')).toArray
  private def sample(chars: Array[Char]): String =
    Array.fill(rnd.nextInt(24))(chars(rnd.nextInt(chars.length))).mkString

  test("unreserved strings survive {var} expansion verbatim") {
    (1 to 500).foreach { _ =>
      val s = sample(unreservedChars)
      assert(UriTemplate.compile("{v}").expand(Map("v" -> s)) == s)
    }
  }

  test("default-operator expansion emits only unreserved or pct-triplets") {
    val legal = "^([A-Za-z0-9\\-._~]|%[0-9A-F]{2})*$".r
    (1 to 500).foreach { _ =>
      val s = sample(anyChars)
      val out = UriTemplate.compile("{v}").expand(Map("v" -> s))
      assert(legal.findFirstIn(out).isDefined, s"illegal chars in '$out'")
    }
  }

  test("expansion then pct-decode round-trips arbitrary text") {
    (1 to 500).foreach { _ =>
      val s = sample(anyChars)
      val out = UriTemplate.compile("{v}").expand(Map("v" -> s))
      assert(Iri.pctDecode(out) == s, s"round-trip failed for '$s' via '$out'")
    }
  }

  test("reserved operator output decodes back when input has no pct-triplet") {
    (1 to 500).foreach { _ =>
      val s = sample(anyChars)
      if (!s.matches("(?s).*%[0-9a-fA-F]{2}.*")) {
        val out = UriTemplate.compile("{+v}").expand(Map("v" -> s))
        assert(Iri.pctDecode(out) == s)
      }
    }
  }
}

class IriPropertySpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(7)
  private def seg: String =
    Array.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString
  private def absUri: String = s"http://$seg/$seg/$seg"

  test("resolving an absolute IRI returns it unchanged") {
    (1 to 500).foreach { _ =>
      val (base, ref) = (absUri, absUri)
      assert(Iri.resolve(base, ref) == ref)
      assert(Iri.expand(base, ref) == ref)
    }
  }
  test("resolving empty returns base; fragment appends") {
    (1 to 500).foreach { _ =>
      val base = absUri
      assert(Iri.resolve(base, "") == base)
      assert(Iri.resolve(base, "#f") == base + "#f")
    }
  }
  test("relative resolution replaces the last segment") {
    (1 to 500).foreach { _ =>
      val (base, rel) = (absUri, seg)
      val out = Iri.resolve(base, rel)
      assert(out == base.substring(0, base.lastIndexOf('/') + 1) + rel)
    }
  }
}

class Uax35PropertySpec extends AnyFunSuite {
  private val default = Uax35Number.compile(None)
  private val rnd = new scala.util.Random(11)

  test("canonical number output is a fixpoint of the default parser") {
    (1 to 500).foreach { _ =>
      val lex = s"${rnd.nextLong() / 2}.${rnd.nextInt(1000000)}"
      default.parse(lex) match {
        case Right(canonical) =>
          assert(default.parse(canonical) == Right(canonical))
        case Left(e) => fail(s"default parser rejected $lex: $e")
      }
    }
  }

  test("grouped integers canonicalize to ungrouped, value-preserving") {
    (1 to 500).foreach { _ =>
      val n = math.abs(rnd.nextLong() % 999999999999L) + 1
      val grouped = f"$n%,d"
      default.parse(grouped) match {
        case Right(canonical) => assert(canonical == n.toString)
        case Left(e) => fail(e)
      }
    }
  }
}
