package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.core.UrlNormalizer

/** Property-based contracts of the URL canonicalizer — the algebra the
  * whole seen-set design rests on. The seen set keys on
  * xxhash64(canonical(url)); if canonicalization were not idempotent,
  * a URL could hash one way at discovery (raw link) and another on a
  * later encounter (already-canonical frontier row) and the dedupe
  * would silently split or merge identities. Golden vectors pin the
  * mapping for known inputs; these properties pin the ALGEBRA for
  * arbitrary ones, including garbage that must never throw.
  */
class UrlNormalizerPropertySpec extends AnyFunSuite {

  /** Deterministic forAll (no scalatestplus bridge ships offline):
    * walks a fixed seed chain, so failures replay identically.
    */
  private def forAll[A](gen: Gen[A], n: Int = 400)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(20260817L)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private val schemeGen = Gen.oneOf("http", "https", "HTTP", "Https", "ftp")
  private val hostGen = for {
    parts <- Gen.nonEmptyListOf(Gen.oneOf(
      "Example", "www", "news", "API", "a1", "x-y", "sub.domain"))
    tld <- Gen.oneOf("com", "ORG", "co.uk", "io")
  } yield (parts.take(3) :+ tld).mkString(".")
  private val portGen = Gen.oneOf("", ":80", ":443", ":8080")
  private val pathGen = Gen.listOf(Gen.oneOf(
    "a", "B", "p%41th", "..", ".", "with space", "f.html", "2026", "~user"))
    .map(segs => segs.take(5).mkString("/", "/", ""))
  private val queryGen = Gen.oneOf("", "?q=1", "?utm_source=x&q=1",
    "?b=2&a=1", "?utm_campaign=only", "?a=%20x", "?dup=1&dup=2")
  private val fragGen = Gen.oneOf("", "#top", "#sec%20tion")

  private val urlGen: Gen[String] = for {
    s <- schemeGen; h <- hostGen; p <- portGen
    path <- pathGen; q <- queryGen; f <- fragGen
  } yield s"$s://$h$p$path$q$f"

  test("canonicalize is idempotent: canonical output re-canonicalizes to itself") {
    forAll(urlGen) { url =>
      UrlNormalizer.canonicalize(url).foreach { c =>
        assert(UrlNormalizer.canonicalize(c) === Some(c),
          s"not a fixpoint: $url -> $c")
      }
    }
  }

  test("canonical urls never carry fragments, tracking params or upper-case scheme/host") {
    forAll(urlGen) { url =>
      UrlNormalizer.canonicalize(url).foreach { c =>
        assert(!c.contains("#"), s"fragment survived: $c")
        assert(!c.contains("utm_"), s"tracking param survived: $c")
        val scheme = c.takeWhile(_ != ':')
        assert(scheme === scheme.toLowerCase, s"scheme case: $c")
        assert(UrlNormalizer.hostOf(c) === UrlNormalizer.hostOf(c).toLowerCase)
      }
    }
  }

  test("hostOf of a canonical url is stable and embedded in it") {
    forAll(urlGen) { url =>
      UrlNormalizer.canonicalize(url).foreach { c =>
        val h = UrlNormalizer.hostOf(c)
        assert(h.nonEmpty && c.contains(h), s"host $h not in canonical $c")
      }
    }
  }

  test("arbitrary garbage never throws (total functions)") {
    forAll(Gen.oneOf(Gen.asciiPrintableStr, Gen.alphaNumStr,
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString))) { s =>
      UrlNormalizer.canonicalize(s) // Option result, must not throw
      UrlNormalizer.hostOf(s)
      UrlNormalizer.parse(s)
      ()
    }
  }

  test("manual authority split is byte-identical to the ServerAuthority regex") {
    val netlocGen: Gen[String] = {
      val atoms = Gen.oneOf("host", "Example.COM.", "a", "@", ":", "8080",
        "user", "pass:word", "", "xn--p1ai", "127.0.0.1", "[::1]")
      Gen.listOf(atoms).map(_.take(6).mkString)
    }
    val edges = Seq("", "host", "host:8080", "host:", ":8080", "@host",
      "user@", "user@host", "user@host:81", "a@b@c:9", "u:p@h:1:2",
      "host.", "HOST.:80", "@", "::", "u@:1", "u@h:")
    def regexTwin(n: String): Option[(String, String, String)] = n match {
      case UrlNormalizer.ServerAuthority(u, h, p) => Some((u, h, p))
      case _ => None
    }
    def manual(n: String): Option[(String, String, String)] = {
      val a = UrlNormalizer.splitAuthority(n)
      if (a == null) None else Some((a(0), a(1), a(2)))
    }
    (edges ++ Seq.empty).foreach(n => assert(manual(n) === regexTwin(n), s"netloc <$n>"))
    forAll(netlocGen, 800)(n => assert(manual(n) === regexTwin(n), s"netloc <$n>"))
  }

  test("collapsePath fast path never skips a collapsible pattern") {
    // the fast path claims: no "//" and no "/." => the Collapse regex
    // cannot match; verify against the raw pattern on generated paths
    val collapse = """([^/]+/\.\./?|/\./|//|/\.$|/\.\.$)""".r
    val segGen = Gen.oneOf("a", "b", ".", "..", "...", "x.y", "", "a.", ".a")
    val pGen = for {
      segs <- Gen.listOf(segGen).map(_.take(6))
      lead <- Gen.oneOf("", "/")
      tail <- Gen.oneOf("", "/")
    } yield segs.mkString(lead, "/", tail)
    forAll(pGen, 800) { p =>
      if (p.indexOf("//") < 0 && p.indexOf("/.") < 0)
        assert(collapse.findFirstIn(p).isEmpty, s"fast path wrong for <$p>")
      // and the collapsed result is always the regex fixpoint
      val viaRegex = {
        var path = p; var last = ""
        while (last != path) { last = path; path = collapse.replaceFirstIn(path, "/") }
        path
      }
      assert(UrlNormalizer.collapsePath(p) === viaRegex, s"collapse <$p>")
    }
  }

  test("dot-segment collapse is idempotent; no interior dot-segments survive") {
    forAll(pathGen) { p =>
      val once = UrlNormalizer.collapsePath(p)
      assert(UrlNormalizer.collapsePath(once) === once)
      // reference parity (urlnorm.py:64): `seg/../` collapses but a
      // ROOT-level `/../` has no preceding segment and is a fixpoint —
      // RFC 3986 would drop it; the reference (and therefore we, for
      // hash parity) keep it. So: no collapsible patterns remain.
      assert(!once.contains("/./") && !(once.contains("//")),
        s"collapsible segment survived: $p -> $once")
      assert(!"""[^/]+/\.\./""".r.findFirstIn(once).isDefined &&
        !"""[^/]/\.\.$""".r.findFirstIn(once).isDefined,
        s"interior ../ survived: $p -> $once")
    }
  }
}
