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

  test("non-URL text degrades to empty parts, never throws") {
    assert(canon("not a url at all") === (("", "https://", "")))
  }
}
