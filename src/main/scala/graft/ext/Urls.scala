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

  /** Lowercased authority (host[:port]) of an absolute URL; NULL-safe
    * empty string when the pattern misses.
    */
  def host(c: Column): Column =
    lower(regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  /** [[host]] with one leading `www.` stripped. */
  def hostNoWww(c: Column): Column =
    regexp_replace(host(c), "^www\\.", "")

  /** Path component, original case (case-sensitive on real servers). */
  def path(c: Column): Column =
    regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Query string with every `utm_*` parameter removed and separators
    * re-normalized (no leading/dangling `&`).
    */
  def cleanQuery(c: Column): Column = {
    val q = regexp_extract(c, "\\?([^#]*)", 1)
    regexp_replace(regexp_replace(q, "(^|&)utm_[^&]*", ""), "^&+", "")
  }

  /** Registrable domain by the last-two-labels heuristic. */
  def domain(c: Column): Column =
    regexp_extract(hostNoWww(c), "([^.]+\\.[^.]+)$", 1)

  /** The canonical URL: `https://` + cleaned host + path [+ `?` + cleaned
    * query]. Deterministic, per-row, codegen-resident.
    */
  def canonicalize(c: Column): Column = {
    val q = cleanQuery(c)
    concat(lit("https://"), hostNoWww(c), path(c),
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }
}
