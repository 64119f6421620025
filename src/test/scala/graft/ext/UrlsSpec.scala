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

  test("only utm_* params are stripped; order of the rest is preserved") {
    assert(canon("https://a.io/p?b=2&utm_x=1&a=1")._2 === "https://a.io/p?b=2&a=1")
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
}
