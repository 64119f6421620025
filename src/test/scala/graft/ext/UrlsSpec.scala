package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): (String, String, String) = {
    val r = Seq(url).toDF("u").select(
      Urls.hostNoWww(col("u")).as("h"),
      Urls.canonicalize(col("u")).as("c"),
      Urls.domain(col("u")).as("d")).head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("canonicalize: case, www, tracking params, fragment") {
    assert(canon("HTTP://WWW.News.Example.COM/A/b?utm_source=x&id=7&utm_medium=m#frag") ===
      (("news.example.com", "https://news.example.com/A/b?id=7", "example.com")))
  }

  test("the two spellings of the same page canonicalize identically") {
    val a = canon("https://www.site.com/page?utm_campaign=c")
    val b = canon("http://SITE.com/page")
    assert(a === b)
    assert(a._2 === "https://site.com/page")
  }

  test("path case survives; query-free and path-free URLs are stable") {
    assert(canon("https://x.org/CaseSensitive")._2 === "https://x.org/CaseSensitive")
    assert(canon("https://x.org")._2 === "https://x.org")
    assert(canon("https://x.org")._3 === "x.org")
  }

  test("tracking params are stripped whole; order of the rest is preserved") {
    assert(canon("https://a.io/p?b=2&utm_x=1&a=1")._2 === "https://a.io/p?b=2&a=1")
    assert(canon("https://a.io/p?fbclid=x&id=7&gclid=y&ref=tw")._2 === "https://a.io/p?id=7")
    // a ref-only query empties: no dangling '?'
    assert(canon("https://a.io/p?ref=feed")._2 === "https://a.io/p")
  }

  test("'ref' strips but 'referrer=' survives: params match whole, not by prefix") {
    assert(canon("https://a.io/p?ref=tw&referrer=keep&q=1")._2 ===
      "https://a.io/p?referrer=keep&q=1")
  }

  test("percent-encoding: unreserved escapes decode, reserved hex uppercases") {
    assert(canon("https://x.org/%7Ehome/%41rticle")._2 === "https://x.org/~home/Article")
    // %2F is a reserved '/': decoding would change path structure — only
    // the hex case normalizes
    assert(canon("https://x.org/p%2fq")._2 === "https://x.org/p%2Fq")
    // malformed '%' passes through; %25 ('%') stays encoded, NO cascade:
    // %2541 is an escaped "%41", not an 'A'
    assert(canon("https://x.org/100%25%2541?a=%7e1")._2 === "https://x.org/100%25%2541?a=~1")
    assert(canon("https://x.org/odd%zz%4")._2 === "https://x.org/odd%zz%4")
  }

  test("dot segments resolve: /a/../b, /./x, trailing and nested forms") {
    assert(canon("https://x.org/a/../b")._2 === "https://x.org/b")
    assert(canon("https://x.org/./x/y")._2 === "https://x.org/x/y")
    assert(canon("https://x.org/a/b/../../c")._2 === "https://x.org/c")
    assert(canon("https://x.org/../a")._2 === "https://x.org/a")
    assert(canon("https://x.org/a/b/..")._2 === "https://x.org/a/")
  }

  test("registrable domain honors the public-suffix snapshot") {
    // a .co.uk site must NOT collapse to 'co.uk' (one quota group for all
    // of .co.uk would be the crawl-policy disaster case)
    assert(canon("https://shop.Example.CO.UK/x")._3 === "example.co.uk")
    assert(canon("https://a.b.site.github.io/x")._3 === "site.github.io")
    assert(canon("https://deep.sub.example.com/x")._3 === "example.com")
    // host that IS a suffix: no registrant label — falls back to last-two
    assert(canon("https://co.uk/")._3 === "co.uk")
  }

  test("non-URL text passes through unchanged: no collapse into one dedup group") {
    // collapsing unparseable values to "https://" would merge unrelated
    // documents under exact url-dedup — pass-through keeps them distinct
    assert(canon("not a url at all")._2 === "not a url at all")
    assert(canon("/relative/path")._2 === "/relative/path")
    assert(canon("site.com/x")._2 === "site.com/x")
  }

  test("userinfo and port are stripped from host and domain") {
    assert(canon("https://user@WWW.Site.com:8080/x") ===
      (("site.com", "https://site.com/x", "site.com")))
  }

  test("a '?' inside the fragment does not fabricate a query") {
    assert(canon("https://site.com/page#sec?x=1")._2 === "https://site.com/page")
    assert(canon("https://site.com/page")._2 === "https://site.com/page")
  }

  test("IDN hosts decode: punycode and Unicode spellings land in one group") {
    // hostNoWww stays the wire form; canon + domain carry the decoded host
    assert(canon("HTTPS://WWW.XN--MNCHEN-3YA.DE:443/pfad/7?ref=x&id=7") ===
      (("xn--mnchen-3ya.de", "https://münchen.de/pfad/7?id=7", "münchen.de")))
    // the raw-IRI spelling canonicalizes to the SAME form
    assert(canon("https://münchen.de/pfad/7?id=7")._2 === "https://münchen.de/pfad/7?id=7")
    // decoded labels still respect the multi-label public-suffix snapshot
    assert(canon("http://sub.xn--mnchen-3ya.co.uk/x")._3 === "münchen.co.uk")
  }

  test("malformed punycode and xn-- in paths pass through verbatim") {
    // an undecodable label must not corrupt the host or kill the row
    val (h, c, _) = canon("https://xn--999999999.com/x")
    assert(h === "xn--999999999.com" && c === "https://xn--999999999.com/x")
    // "xn--" in the PATH is content, not an IDN label — untouched
    assert(canon("https://site.com/xn--mnchen-3ya")._2 ===
      "https://site.com/xn--mnchen-3ya")
  }
}
