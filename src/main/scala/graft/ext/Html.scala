package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl processing: strip script/style/comment
  * blocks, then tags, decode the common entities, collapse whitespace —
  * the first transform a crawled page sees before any quality/dedup pass.
  * Pure Column regexes in the Java∩RE2 subset (embedded `(?is)` flags, no
  * lookarounds, non-greedy block bodies), so the pipeline rides the scan
  * codegen'd and the DuckDB oracle replays it verbatim via [[duckSql]].
  *
  * Deliberately not a DOM parser: at 100 TB the boilerplate-block +
  * tag-strip regex pass is the standard first cut (the reference pipelines
  * for CommonCrawl-scale text do structural extraction in a later,
  * sampled stage); malformed markup degrades to extra whitespace, never
  * an error.
  */
object Html {

  /** Block elements whose CONTENT must go, not just their tags. */
  private val ScriptPat = "(?is)<script[^>]*>.*?</script>"
  private val StylePat = "(?is)<style[^>]*>.*?</style>"
  private val CommentPat = "(?s)<!--.*?-->"
  private val TagPat = "<[^>]+>"
  // unanchored: both engines' regexp_extract substring-search, so the
  // FIRST title wins (an anchored greedy .* prefix would take the last)
  private val TitlePat = "(?is)<title[^>]*>(.*?)</title>"
  // `[\s>]` not `\s`: a bare `<a>` (legal, common) is still an anchor
  private val LinkPat = "(?i)<a[\\s>]"

  /** Entity decode order: named/numeric entities first, `&amp;` LAST —
    * decoding `&` early would turn the literal text `&amp;lt;` into `<`
    * (double-decode); this order yields the correct single decode `&lt;`.
    */
  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, r)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), r)
    }

  /** Visible text: blocks → tags → entities → whitespace collapse. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, ScriptPat, " ")
    val noStyle = regexp_replace(noScript, StylePat, " ")
    val noComment = regexp_replace(noStyle, CommentPat, " ")
    val noTags = regexp_replace(noComment, TagPat, " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** First <title> content ('' when absent), inner whitespace collapsed. */
  def title(c: Column): Column =
    trim(regexp_replace(regexp_extract(c, TitlePat, 1), "\\s+", " "))

  /** Number of <a …> anchors. */
  def linkCount(c: Column): Column =
    size(regexp_extract_all(c, lit(LinkPat), lit(0))).cast("long")

  // --- DuckDB twins (same patterns, RE2 semantics match Java here) ---------

  private def sq(s: String): String = s.replace("'", "''")

  /** DuckDB expression computing [[stripHtml]] over SQL expression `e`. */
  def stripHtmlSql(e: String): String = {
    val noBlocks = Seq(ScriptPat, StylePat, CommentPat, TagPat)
      .foldLeft(e)((acc, p) => s"regexp_replace($acc, '${sq(p)}', ' ', 'g')")
    val decoded = Entities.foldLeft(noBlocks) { case (acc, (ent, r)) =>
      s"replace($acc, '${sq(ent)}', '${sq(r)}')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** DuckDB expression computing [[title]] over SQL expression `e`. */
  def titleSql(e: String): String =
    s"trim(regexp_replace(coalesce(regexp_extract($e, '${sq(TitlePat)}', 1), ''), '\\s+', ' ', 'g'))"

  /** DuckDB expression computing [[linkCount]] over SQL expression `e`. */
  def linkCountSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '${sq(LinkPat)}')) AS BIGINT)"
}
