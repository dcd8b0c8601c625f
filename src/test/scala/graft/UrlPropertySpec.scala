package graft

import graft.functions.UrlCanonUtil
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants of [[graft.functions.UrlCanonUtil]] over
  * ARBITRARY generated URLs (not just the corpus synthesis): the
  * contracts a canonicalizer must uphold for dedup keys to be sound.
  * Same deterministic-seed scalacheck harness as Scd2PropertySpec. */
class UrlPropertySpec extends SparkSpec {

  private def forSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var seed = Seed(1337L)
    (0 until n).foreach { _ =>
      body(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private def c(s: String): String =
    UrlCanonUtil.canonicalize(UTF8String.fromString(s)).toString

  private val genParam: Gen[String] = Gen.oneOf(
    Gen.oneOf("a=1", "b=2", "id=77", "q=x%20y", "z", "ref=nav"),
    Gen.oneOf("utm_source=s", "utm_medium=m", "UTM_CAMPAIGN=c",
      "fbclid=F123", "gclid=G", "msclkid=M"),
    Gen.const(""))

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "Http")
    user <- Gen.oneOf("", "u:P@")
    host <- Gen.oneOf("Example.COM", "a.b.example.org", "www.X.net",
      "[::1]", "example7.com")
    port <- Gen.oneOf("", ":80", ":443", ":8080", ":65000")
    path <- Gen.oneOf("", "/", "/P/x", "/a/b/c", "/trailing/",
      "/%7Euser", "/a%2Fb", "/x%41%6a", "/bad%zz", "/cut%4")
    params <- Gen.listOfN(4, genParam)
    hasQ <- Gen.oneOf(true, false)
    frag <- Gen.oneOf("", "#top", "#Sec2")
  } yield {
    val q = if (hasQ) "?" + params.mkString("&") else ""
    s"$scheme://$user$host$port$path$q$frag"
  }

  test("canonicalization is IDEMPOTENT on arbitrary URLs") {
    // the dedup-key contract: keys must be a fixed point, or re-running
    // the pipeline over already-canonical URLs would split groups
    forSamples(genUrl, 500) { u =>
      val once = c(u)
      assert(c(once) === once, s"not a fixed point: $u -> $once")
    }
  }

  test("canonical output invariants: no fragment, no tracking keys, sorted query") {
    forSamples(genUrl, 500) { u =>
      val out = c(u)
      assert(!out.contains("#"), s"fragment survived: $u -> $out")
      val q = out.indexOf('?')
      if (q >= 0) {
        val params = out.substring(q + 1).split("&", -1).toSeq
        assert(params.forall(_.nonEmpty), s"empty param survived: $out")
        assert(params.forall { p =>
          val k = p.takeWhile(_ != '=').toLowerCase
          !k.startsWith("utm_") && k != "fbclid" && k != "gclid" &&
            k != "msclkid"
        }, s"tracking key survived: $u -> $out")
        assert(params === params.sorted, s"query unsorted: $out")
      }
      // scheme and host are lowercase; path case is untouched
      val sep = out.indexOf("://")
      assert(sep > 0 && out.substring(0, sep) ===
        out.substring(0, sep).toLowerCase)
      val auth = out.substring(sep + 3)
        .takeWhile(ch => ch != '/' && ch != '?')
      val hostPart = auth.substring(auth.lastIndexOf('@') + 1)
      assert(hostPart === hostPart.toLowerCase, s"host case: $out")
    }
  }

  test("equivalence classes: tracking params, fragments, param order, case never split keys") {
    forSamples(genUrl, 300) { u =>
      // adding a fragment or a tracking param to ANY url must not
      // change its canonical form
      assert(c(u + (if (u.contains('#')) "" else "#x")) ===
        c(u.takeWhile(_ != '#') + "#x"))
      val noFrag = u.takeWhile(_ != '#')
      val withTracking =
        if (noFrag.contains('?')) noFrag + "&utm_source=zzz"
        else noFrag + "?utm_source=zzz"
      assert(c(withTracking) === c(noFrag),
        s"tracking param changed the key: $noFrag")
    }
  }

  test("percent-encoding: unreserved escapes decode, reserved survive uppercased, malformed pass through") {
    // RFC 3986 §6.2.2.2 — the lossless subset only (round-13 verdict #5)
    assert(c("http://a/%7Euser") === "http://a/~user")
    assert(c("http://a/%7euser") === "http://a/~user")
    assert(c("http://a/%41B%43") === "http://a/ABC")
    assert(c("http://a/%7Euser") === c("http://a/~user"), "under-merge closed")
    // reserved escapes are NOT decoded (%2F != /), hex uppercases
    assert(c("http://a/x%2fy") === "http://a/x%2Fy")
    assert(c("http://a/x%2Fy") === "http://a/x%2Fy")
    assert(c("http://a/q?k=x%20y") === "http://a/q?k=x%20y")
    // malformed: truncated or non-hex escapes pass through verbatim
    assert(c("http://a/bad%zz") === "http://a/bad%zz")
    assert(c("http://a/cut%4") === "http://a/cut%4")
    // host decodes before the case fold (idempotence needs this order)
    assert(c("http://ex%41mple.com/") === "http://example.com/")
    // a tracking key can't hide behind an unreserved escape
    assert(c("http://a/p?%75tm_source=x&id=1") === "http://a/p?id=1")
    // every case above is a fixed point
    Seq("http://a/%7Euser", "http://a/x%2fy", "http://a/bad%zz",
      "http://ex%41mple.com/", "http://a/p?%75tm_source=x&id=1")
      .foreach(u => assert(c(c(u)) === c(u), s"not idempotent: $u"))
  }

  test("scheme and port validation: non-URL prefixes and non-ASCII digits pass through") {
    // RFC 3986 §3.1 scheme grammar — '://' inside a non-URL prefix is
    // not a hierarchical URL (round-13 ADVICE)
    assert(c("not a url ://host/PATH") === "not a url ://host/PATH")
    assert(c("{\"u\":\"x\"}://Y") === "{\"u\":\"x\"}://Y")
    assert(c("h2+.x-://HOST/p") === "h2+.x-://host/p") // valid per grammar
    // Unicode decimal digits (e.g. Devanagari २) are not a port: the
    // ':' suffix stays part of the host text, case-folded as such
    val deva = "http://Host:२३/p"
    assert(c(deva) === "http://host:२३/p")
    // ASCII ports still parse (default stripped, non-default kept)
    assert(c("HTTP://Host:80/p") === "http://host/p")
    assert(c("HTTP://Host:8080/p") === "http://host:8080/p")
  }
}
