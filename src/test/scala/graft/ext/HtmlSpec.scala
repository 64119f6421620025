package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML → text extraction (T13): block-content removal, entity decode
  * order, first-title rule, malformed-markup degradation.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Html.stripHtml(col("h"))).as[String].head()

  test("script/style/comment CONTENT is removed, not just the tags") {
    val out = strip(
      "<p>keep</p><script>var dropped = 1 < 2;</script>" +
        "<style>.x{color:red}</style><!-- dropped\ntoo -->tail")
    assert(out === "keep tail")
  }

  test("entity decode order: &amp;lt; is the literal text &lt;, not <") {
    assert(strip("a &amp;lt; b") === "a &lt; b")
    assert(strip("a &lt; b &amp; c &quot;d&quot;") === "a < b & c \"d\"")
    assert(strip("x&nbsp;y &#39;z&#39; &apos;w&apos;") === "x y 'z' 'w'")
  }

  test("title: first title wins, inner whitespace collapses, absent -> empty") {
    val t = Seq(
      "<title> A \n B </title><title>second</title>",
      "no title here").toDF("h")
      .select(Html.title(col("h"))).as[String].collect()
    assert(t.toSeq === Seq("A B", ""))
  }

  test("linkCount is case-insensitive, counts bare <a>, rejects <abbr>") {
    val n = Seq("<a href=x>1</a> <A HREF=y>2</A> <a>bare</a> <abbr>not an anchor</abbr>")
      .toDF("h").select(Html.linkCount(col("h"))).as[Long].head()
    assert(n === 3L)
  }

  test("malformed markup degrades to whitespace, never errors") {
    assert(strip("<p unclosed attr <div>text") === "text")
    assert(strip("") === "")
    assert(strip("plain words stay put") === "plain words stay put")
  }
}
