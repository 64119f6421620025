package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the step a crawl pipeline runs BEFORE url-level
  * dedup: the same page arrives as `HTTP://WWW.Site.com/a?utm_source=x#top`,
  * `http://site.com/./a/../a?fbclid=y`, and `https://site.com/%61`, and
  * exact dedup on the raw string misses the duplicate. Canonical form here
  * (RFC 3986 §6 syntax-based normalization, adapted to crawl practice):
  *
  *   - lowercased host, `www.` / userinfo / explicit port stripped, IDN
  *     (`xn--` punycode) labels decoded to Unicode
  *   - percent-encoding normalization: unreserved escapes (`%7E` → `~`,
  *     `%41` → `A`) DECODED, every remaining escape's hex UPPERCASED
  *     (`%2f` → `%2F` — decoding reserved chars would change semantics)
  *   - dot-segment removal (`/a/../b` → `/b`, `/./x` → `/x`)
  *   - tracking params (`utm_*`, `fbclid`, `gclid`, `ref`) removed as WHOLE
  *     params — `referrer=x` is a different parameter and survives
  *   - fragment dropped, scheme pinned to `https`
  *
  * Registrable-domain extraction carries an embedded multi-label
  * public-suffix SNAPSHOT so `example.co.uk` yields `example.co.uk`, not
  * `co.uk` (which would merge every `.co.uk` site into one quota/mixing
  * group).
  *
  * Beyond the reference's surface (its tables carry no URLs; SURVEY.md §2
  * is purely relational) — LLM-pipeline operator layer like TextAnalysis.
  * Everything is pure `Column` work over builtins (regex in the Java∩RE2
  * common subset, split/transform/filter higher-order functions) except
  * the IDN decode — a native codegen'd expression over the JDK's embedded
  * punycode tables, since RFC 3492 is not expressible as Column/SQL — so
  * the u1/u2 oracles replay exactly and at 100 TB the whole pass rides the
  * scan as per-row map work with no shuffle; url-level dedup is then
  * [[Dedup.exact]]-style hash-groupBy on `canonicalize`'s output. Each
  * helper has a `…Sql` twin generating the equivalent DuckDB expression
  * FROM THE SAME constants (the IDN step's twin is a hand-verified decode
  * table over the planted hosts — DuckDB has no punycode surface), so the
  * two engines cannot drift silently.
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

  /** [[hostNoWww]] with IDN (`xn--` punycode) labels decoded to Unicode
    * ([[org.apache.spark.sql.graft.IdnHostUnicode]] — embedded JDK decode,
    * no network): an international crawl sees `münchen.de` both as a raw
    * IRI and as `xn--mnchen-3ya.de` on the wire, and [[canonicalize]] /
    * [[domain]] must land both in ONE group. Hosts without `xn--` pass
    * through untouched on a zero-allocation fast path; malformed punycode
    * passes through verbatim (conservative, like the canonicalizer's
    * garbage pass-through). Non-ASCII PATH bytes are out of scope here —
    * they stay percent-encoded with case-normalized hex ([[pctNormalize]]).
    */
  def hostUnicode(c: Column): Column =
    org.apache.spark.sql.graft.IdnHostUnicode.idnHostUnicode(hostNoWww(c))

  /** Path component, original case (case-sensitive on real servers). */
  def path(c: Column): Column =
    regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  // ---- percent-encoding normalization -----------------------------------

  /** Single-pass split-on-`%` decoder: piece 0 passes through; every later
    * piece began with `%`. A piece opening with two hex digits is an
    * escape: decode it if the code is UNRESERVED (RFC 3986 §2.3 — ALPHA /
    * DIGIT / `-` `.` `_` `~`; uppercase-hex string ranges are numeric
    * ranges because hex digits sort lexicographically), else keep it with
    * UPPERCASED hex. Malformed `%` (no hex pair) passes through verbatim.
    * One pass over the string — no cascaded re-decoding (`%2541` ends as
    * `%41`, correctly NOT `A`) and no O(alphabet) regex chain.
    */
  private def pctDecodePiece(p: Column): Column = {
    val hexU = upper(substring(p, 1, 2))
    val rest = substring(p, 3, Int.MaxValue)
    val unreserved = (hexU >= "30" && hexU <= "39") || // 0-9
      (hexU >= "41" && hexU <= "5A") ||                // A-Z
      (hexU >= "61" && hexU <= "7A") ||                // a-z
      hexU.isin("2D", "2E", "5F", "7E")                // - . _ ~
    when(p.rlike("^[0-9A-Fa-f]{2}"),
      when(unreserved, concat(decode(unhex(hexU), "UTF-8"), rest))
        .otherwise(concat(lit("%"), hexU, rest)))
      .otherwise(concat(lit("%"), p))
  }

  /** [[pctDecodePiece]] over every escape of a string. */
  def pctNormalize(c: Column): Column = {
    val parts = split(c, "%", -1)
    concat(element_at(parts, 1),
      array_join(transform(slice(parts, lit(2), size(parts)), pctDecodePiece _), ""))
  }

  /** DuckDB twin of [[pctNormalize]] — `e` must be a simple column
    * reference (it is repeated; the oracle names intermediates in CTEs).
    * Same algorithm: 1-based string/list slicing, `decode(from_hex(…))`
    * only in the unreserved branch (ASCII, so it cannot hit an
    * invalid-UTF8 error). The hex pair is inlined rather than named — a
    * lambda body cannot host a subquery.
    */
  def pctNormalizeSql(e: String): String = {
    val h2 = "upper(p[1:2])"
    val unres = s"(($h2 BETWEEN '30' AND '39') OR ($h2 BETWEEN '41' AND '5A') OR " +
      s"($h2 BETWEEN '61' AND '7A') OR $h2 IN ('2D','2E','5F','7E'))"
    val piece = "CASE WHEN regexp_matches(p, '^[0-9A-Fa-f]{2}') THEN " +
      s"(CASE WHEN $unres THEN decode(from_hex($h2)) || p[3:] " +
      s"ELSE '%' || $h2 || p[3:] END) " +
      "ELSE '%' || p END"
    // coalesce: DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
    s"(string_split($e, '%')[1] || coalesce(array_to_string(" +
      s"list_transform(string_split($e, '%')[2:], p -> $piece), ''), ''))"
  }

  // ---- dot-segment removal ----------------------------------------------

  /** One pass cannot fix nested `a/b/../../c` (the second `..` only becomes
    * removable after the first resolves), so the three rules fold
    * `DotSegmentPasses` times — depth beyond that survives unresolved, the
    * conservative failure (both engines run the identical fold, so the
    * oracle replay cannot drift). Rules, in order: `/./` (or trailing
    * `/.`) → `/`; leading `/../` → `/` (nothing above root); `/seg/../` →
    * `/`.
    */
  val DotSegmentPasses = 8
  private val dotSegmentRules = Seq(
    "/\\.(/|$)" -> "/",
    "^/\\.\\.(/|$)" -> "/",
    "/[^/]+/\\.\\.(/|$)" -> "/")

  def removeDotSegments(c: Column): Column =
    (1 to DotSegmentPasses).foldLeft(c) { (e, _) =>
      dotSegmentRules.foldLeft(e) { case (x, (pat, rep)) => regexp_replace(x, pat, rep) }
    }

  def removeDotSegmentsSql(e: String): String =
    (1 to DotSegmentPasses).foldLeft(e) { (x, _) =>
      dotSegmentRules.foldLeft(x) { case (y, (pat, rep)) =>
        s"regexp_replace($y, '$pat', '$rep', 'g')"
      }
    }

  // ---- query cleaning ---------------------------------------------------

  /** A whole tracking parameter: `utm_*`, or the click-id/referral keys,
    * with or without a value. Anchored per-param (the query is split on
    * `&` first), so `ref` matches but `referrer=x` does not — a substring
    * regex over the raw query could not make that distinction without
    * lookarounds, which RE2 (the oracle's engine) lacks.
    *
    * POLICY KNOB, not a universal truth — `ref` especially: on social
    * referrals it is pure tracking, but some sites select CONTENT with it
    * (a VCS web UI's `?ref=branch` names a different page per value), and
    * there canonicalize-then-dedup would merge distinct documents. A
    * deployment crawling such hosts should drop `ref` from this list (or
    * scope the list per registrable domain); the default follows the
    * common-crawl convention of treating bare `ref` as referral tracking.
    */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

  /** Query string with percent-encoding normalized and tracking params
    * removed. The fragment is cut BEFORE the `?` search: a `?` inside a
    * fragment (`/page#sec?x=1`) is fragment content, not a query, and must
    * not fabricate one. Normalizing escapes BEFORE the `&` split is safe
    * because `&`/`=` are reserved — never decoded, so param boundaries
    * cannot appear or vanish.
    */
  def cleanQuery(c: Column): Column = {
    val q = pctNormalize(regexp_extract(regexp_replace(c, "#.*", ""), "\\?(.*)$", 1))
    array_join(filter(split(q, "&", -1), p => !p.rlike(TrackingParamRe)), "&")
  }

  /** Raw query extraction as DuckDB SQL (fragment cut first, like
    * [[cleanQuery]]); `e` = raw url reference. Feed the result through
    * [[pctNormalizeSql]] then [[trackingFilterSql]] in CTE stages.
    */
  def rawQuerySql(e: String): String =
    s"regexp_extract(regexp_replace($e, '#.*', ''), '\\?(.*)$$', 1)"

  /** Tracking-param filter as DuckDB SQL; `e` = reference to the ALREADY
    * percent-normalized query string.
    */
  def trackingFilterSql(e: String): String =
    // coalesce: an all-tracking query filters to [], which DuckDB's
    // array_to_string renders NULL where Spark's array_join renders ''
    s"coalesce(array_to_string(list_filter(string_split($e, '&'), " +
      s"p -> NOT regexp_matches(p, '$TrackingParamRe')), '&'), '')"

  // ---- registrable domain -----------------------------------------------

  /** Embedded public-suffix SNAPSHOT: multi-label suffixes under which the
    * registrable domain is three labels, not two. A hand-curated
    * high-traffic subset of the Mozilla PSL (the full list is ~10k entries
    * and needs periodic refresh — swap in a generated version for
    * production); single-label TLDs need no entry because last-two-labels
    * is already correct there.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk", "ltd.uk",
    "plc.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ac.in", "gov.in",
    "co.za", "org.za", "net.za", "web.za", "gov.za", "ac.za",
    "co.kr", "or.kr", "ac.kr", "go.kr", "ne.kr",
    "co.id", "or.id", "ac.id", "web.id", "go.id",
    "co.th", "ac.th", "or.th", "go.th", "in.th",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my", "com.ph",
    "com.vn", "com.eg", "com.sa", "com.ua", "com.co", "com.pe", "com.ve",
    // private-registry suffixes: every user site is a distinct registrant
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "azurewebsites.net", "pages.dev", "workers.dev", "wixsite.com")

  private val suffixAlt = MultiLabelSuffixes.map(_.replace(".", "\\.")).mkString("|")
  private val psPat = s"([^.]+\\.(?:$suffixAlt))$$"
  private val twoLabelPat = "([^.]+\\.[^.]+)$"

  /** Registrable domain: label + public suffix when the host ends in a
    * listed multi-label suffix, else last two labels. A host that IS a
    * listed suffix (rare, e.g. a crawl of `co.uk` itself) falls back to
    * last-two — there is no registrant label to keep. Works over the
    * IDN-DECODED host ([[hostUnicode]]) so punycode and Unicode spellings
    * of one registrant group together.
    */
  def domain(c: Column): Column = {
    val h = hostUnicode(c)
    val ps = regexp_extract(h, psPat, 1)
    when(length(ps) > 0, ps).otherwise(regexp_extract(h, twoLabelPat, 1))
  }

  /** DuckDB twin of [[domain]]; `e` = simple reference to the HOST (already
    * lowercased, www-stripped) — the oracle names the host in a CTE first.
    */
  def domainSql(e: String): String =
    s"(CASE WHEN length(regexp_extract($e, '$psPat', 1)) > 0 " +
      s"THEN regexp_extract($e, '$psPat', 1) " +
      s"ELSE regexp_extract($e, '$twoLabelPat', 1) END)"

  // ---- canonical form ---------------------------------------------------

  /** The canonical URL: `https://` + cleaned host + normalized path
    * [+ `?` + cleaned query]. A string with no parseable `scheme://host`
    * passes through UNCHANGED: collapsing every schemeless/relative/
    * garbage value to `"https://"` would make downstream exact url-dedup
    * merge unrelated documents into one group — pass-through keeps them
    * deduping only on raw equality, the conservative behavior.
    * The host is IDN-decoded ([[hostUnicode]]) so punycode and Unicode
    * spellings collapse to one canonical form.
    * Deterministic, per-row, no shuffle.
    */
  def canonicalize(c: Column): Column = {
    val h = hostUnicode(c)
    val p = removeDotSegments(pctNormalize(path(c)))
    val q = cleanQuery(c)
    when(length(h) > 0,
      concat(lit("https://"), h, p,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
      .otherwise(c)
  }

  /** `hostNoWww` as DuckDB SQL (for naming the host in an oracle CTE). */
  def hostNoWwwSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(" +
      s"lower(regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), " +
      s"'^[^@]*@', ''), ':[0-9]+$$', ''), '^www\\.', '')"

  /** `path` as DuckDB SQL. */
  def pathSql(e: String): String =
    s"regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"

  /** Canonical-form assembly as DuckDB SQL from CTE-named pieces: `u` the
    * raw url, `h` the cleaned host, `p` the normalized path, `q` the
    * cleaned query — the composition step of [[canonicalize]], the pieces
    * having been built by the other `…Sql` helpers in earlier CTE stages.
    */
  def assembleSql(u: String, h: String, p: String, q: String): String =
    s"(CASE WHEN length($h) > 0 THEN 'https://' || $h || $p || " +
      s"(CASE WHEN length($q) > 0 THEN '?' || $q ELSE '' END) ELSE $u END)"
}
