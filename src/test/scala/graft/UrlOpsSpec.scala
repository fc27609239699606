package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def host(u: String): Option[String] =
    Option(Seq(u).toDF("u").select(UrlOps.urlHost(col("u"))).head().getString(0))

  private def norm(u: String): String =
    Seq(u).toDF("u").select(UrlOps.urlNormalize(col("u"))).head().getString(0)

  private def dom(h: String): String =
    Seq(h).toDF("h").select(UrlOps.registrableDomain(col("h"))).head().getString(0)

  test("urlHost: case, userinfo, ports, missing host") {
    assert(host("https://WWW.Example.COM/path") == Some("www.example.com"))
    assert(host("http://user:pw@example.com:8080/x") == Some("example.com"))
    assert(host("ftp://files.example.org") == Some("files.example.org"))
    assert(host("not a url") == None)
    assert(host("/relative/path") == None)
  }

  test("registrableDomain: eTLD+1 with two-level suffixes") {
    assert(dom("a.b.example.co.uk") == "example.co.uk")
    assert(dom("www.example.com") == "example.com")
    assert(dom("example.com") == "example.com")
    assert(dom("localhost") == "localhost")
    assert(dom("deep.sub.blog.org") == "blog.org")
  }

  test("urlNormalize: ports, fragments, tracking params, trailing slash") {
    assert(norm("HTTPS://Example.COM:443/x?id=1#frag") == "https://example.com/x?id=1")
    assert(norm("http://example.com:80/") == "http://example.com")
    assert(norm("http://example.com:8080/x") == "http://example.com:8080/x")
    // leading tracking param hands ? to the next param
    assert(norm("https://e.com/p?utm_source=a&id=2&utm_campaign=b") == "https://e.com/p?id=2")
    // all params tracking → query gone entirely
    assert(norm("https://e.com/p?utm_source=a&gclid=xyz") == "https://e.com/p")
    assert(norm("https://e.com/?ref=home") == "https://e.com")
    // path case is preserved, host case is not
    assert(norm("https://E.com/CaseSensitive/Path") == "https://e.com/CaseSensitive/Path")
  }

  test("urlNormalize passes scheme-less values through unchanged (no '' collapse)") {
    // regression: both extracts yield '' on a scheme-less input, so every
    // such value used to normalize to "" — one shared exact-dedup key
    assert(norm("not a url") == "not a url")
    assert(norm("/relative/path?utm_source=x#f") == "/relative/path?utm_source=x#f")
    assert(norm("example.com/page") == "example.com/page")
  }

  test("registrableDomain of a null host is null, not ''") {
    val d = Seq((1L, "no scheme here"), (2L, "https://a.example.com/x"))
      .toDF("id", "u")
    val out = d.select(col("id"),
        UrlOps.registrableDomain(UrlOps.urlHost(col("u"))).as("dom"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == None)
    assert(out(2L) == Some("example.com"))
  }

  test("filterBlockedDomains drops blocked eTLD+1 incl. subdomains, keeps unparseable") {
    val d = Seq(
      (1L, "https://spam.bad.com/x"),
      (2L, "https://www.good.org/y"),
      (3L, "nonsense"),
      (4L, "https://bad.com/z")).toDF("id", "u")
    val kept = UrlOps.filterBlockedDomains(d, col("u"), Seq("bad.com"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("domainStats aggregates per registrable domain") {
    val d = Seq(
      (1L, "https://a.x.com/1"), (2L, "https://b.x.com/2"), (3L, "https://y.org/3"))
      .toDF("id", "u")
    val stats = UrlOps.domainStats(d, col("u"))
      .as[(String, Long)].collect().toMap
    assert(stats == Map("x.com" -> 2L, "y.org" -> 1L))
  }
}
