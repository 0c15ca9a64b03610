package graft

import org.apache.spark.sql.functions._
import graft.functions.Urls

/** URL parse/canonicalize semantics: the edge battery the synthetic corpus
  * can't reach (unparseable inputs, IPv4 hosts, userinfo, kept ports,
  * empty-after-filter queries).
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(u: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val r = Seq(u).toDF("u").select(c(col("u")).as("v")).as[String].collect()
    r.head
  }

  test("urlScheme / urlHost / urlPath / urlQuery split the components") {
    val u = "HTTPS://User:pw@WWW.Example.COM:8443/A/B/c.html?x=1&y=2#frag"
    assert(one(u, Urls.urlScheme) == "https")
    assert(one(u, Urls.urlHost) == "www.example.com")
    assert(one(u, Urls.urlPath) == "/A/B/c.html") // path case preserved
    assert(one(u, Urls.urlQuery) == "x=1&y=2")
  }

  test("unparseable inputs coerce to NULL parts and NULL canonical") {
    for (bad <- Seq("not a url", "www.example.com/no-scheme", "", "1234",
        "mailto:a@b.c")) {
      assert(one(bad, Urls.urlScheme) == null, s"scheme of $bad")
      assert(one(bad, Urls.urlHost) == null, s"host of $bad")
      assert(one(bad, Urls.canonicalizeUrl) == null, s"canonical of $bad")
    }
    assert(one(null, Urls.canonicalizeUrl) == null)
  }

  test("registeredDomain: 2-level, generic-SLD ccTLD, IPv4, bare host") {
    def dom(h: String) = {
      val r = Seq(h).toDF("h")
        .select(Urls.registeredDomain(col("h")).as("v")).as[String].collect()
      r.head
    }
    assert(dom("www.example.com") == "example.com")
    assert(dom("a.b.news.example.co.uk") == "example.co.uk")
    assert(dom("example.com.au") == "example.com.au")
    assert(dom("deep.ac.jp") == "deep.ac.jp")
    assert(dom("uk.com.example") == "com.example") // rule is positional
    assert(dom("192.168.0.1") == "192.168.0.1")
    assert(dom("localhost") == "localhost")
    assert(dom("") == null)
  }

  test("canonicalizeUrl: default ports drop, explicit ports stay") {
    assert(one("https://Ex.COM:443/a", Urls.canonicalizeUrl) ==
      "https://ex.com/a")
    assert(one("http://ex.com:80/a", Urls.canonicalizeUrl) ==
      "http://ex.com/a")
    assert(one("http://ex.com:8080/a", Urls.canonicalizeUrl) ==
      "http://ex.com:8080/a")
    assert(one("https://ex.com:80/a", Urls.canonicalizeUrl) ==
      "https://ex.com:80/a") // 80 is not the https default
  }

  test("canonicalizeUrl: tracking params, fragments, slashes, userinfo") {
    assert(one("https://u@Ex.com/p/?utm_source=x&q=1&fbclid=z#top",
      Urls.canonicalizeUrl) == "https://ex.com/p?q=1")
    // query left empty by filtering is dropped entirely
    assert(one("https://ex.com/p?utm_campaign=c&gclid=1",
      Urls.canonicalizeUrl) == "https://ex.com/p")
    // ref= drops, but refid= is a different param and stays
    assert(one("https://ex.com/p?ref=rss&refid=7",
      Urls.canonicalizeUrl) == "https://ex.com/p?refid=7")
    // root path collapses; trailing slash runs trim
    assert(one("https://ex.com/", Urls.canonicalizeUrl) == "https://ex.com")
    assert(one("https://ex.com", Urls.canonicalizeUrl) == "https://ex.com")
    assert(one("https://ex.com/a/b///", Urls.canonicalizeUrl) ==
      "https://ex.com/a/b")
    // trailing host dot normalizes
    assert(one("https://ex.com./a", Urls.canonicalizeUrl) ==
      "https://ex.com/a")
  }

  test("canonical form is variant-invariant (the crawl-dedup property)") {
    val variants = Seq(
      "HTTPS://WWW.Site.COM:443/Page/1?utm_source=a#x",
      "https://www.site.com/Page/1/?utm_medium=b",
      "https://www.site.com/Page/1?fbclid=abc&utm_campaign=c")
    val canon = variants.toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c"))
      .distinct().as[String].collect()
    assert(canon.toSeq == Seq("https://www.site.com/Page/1"))
  }
}
