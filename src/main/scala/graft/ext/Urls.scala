package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the step a crawl pipeline runs BEFORE url-level
  * dedup: the same page arrives as `HTTP://WWW.Site.com/a?utm_source=x#top`
  * and `http://site.com/a`, and exact dedup on the raw string misses the
  * duplicate. Canonical form here: lowercased host with a leading `www.`
  * stripped, original-case path (paths are case-sensitive), tracking
  * (`utm_*`) query parameters removed, fragment dropped, scheme pinned to
  * `https`. Registrable-domain extraction (last two labels — the
  * heuristic; a public-suffix list is the production refinement) supports
  * per-domain mixing/quota policies.
  *
  * Beyond the reference's surface (its tables carry no URLs; SURVEY.md §2
  * is purely relational) — LLM-pipeline operator layer like TextAnalysis.
  * Every helper is a pure `Column` over regex primitives in the Java∩RE2
  * common subset, so the u1 oracle replays exactly and at 100 TB the
  * whole pass rides the scan as per-row map work with no shuffle;
  * url-level dedup is then [[Dedup.exact]]-style hash-groupBy on
  * `canonicalize`'s output.
  */
object Urls {

  /** Lowercased host of an absolute URL, with userinfo (`user@`) and any
    * explicit port stripped — `user@WWW.Site.COM:8080` and `site.com` must
    * not split one real site across dedup groups. Empty string when the
    * URL has no recognizable `scheme://authority` prefix.
    */
  def host(c: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        "^[^@]*@", ""),
      ":[0-9]+$", "")

  /** [[host]] with one leading `www.` stripped. */
  def hostNoWww(c: Column): Column =
    regexp_replace(host(c), "^www\\.", "")

  /** Path component, original case (case-sensitive on real servers). */
  def path(c: Column): Column =
    regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Query string with every `utm_*` parameter removed and separators
    * re-normalized (no leading/dangling `&`). The fragment is cut BEFORE
    * the `?` search: a `?` inside a fragment (`/page#sec?x=1`) is fragment
    * content, not a query, and must not fabricate one.
    */
  def cleanQuery(c: Column): Column = {
    val q = regexp_extract(regexp_replace(c, "#.*", ""), "\\?(.*)$", 1)
    regexp_replace(regexp_replace(q, "(^|&)utm_[^&]*", ""), "^&+", "")
  }

  /** Registrable domain by the last-two-labels heuristic. */
  def domain(c: Column): Column =
    regexp_extract(hostNoWww(c), "([^.]+\\.[^.]+)$", 1)

  /** The canonical URL: `https://` + cleaned host + path [+ `?` + cleaned
    * query]. A string with no parseable `scheme://host` passes through
    * UNCHANGED: collapsing every schemeless/relative/garbage value to
    * `"https://"` would make downstream exact url-dedup merge unrelated
    * documents into one group — pass-through keeps them deduping only on
    * raw equality, the conservative behavior. Deterministic, per-row,
    * codegen-resident.
    */
  def canonicalize(c: Column): Column = {
    val h = hostNoWww(c)
    val q = cleanQuery(c)
    when(length(h) > 0,
      concat(lit("https://"), h, path(c),
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
      .otherwise(c)
  }
}
