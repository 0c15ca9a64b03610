package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing and canonicalization for web-crawl training-data pipelines
  * (domain-level quality filtering, blocklists, crawl dedup — the public
  * C4/RefinedWeb recipe family).
  *
  * Everything is a composition of codegen'd regexp / higher-order-function
  * built-ins — no UDFs — and every regex is RE2-safe (no backreferences,
  * no lookaround), so the exact transformations replay verbatim in the
  * DuckDB oracle. At 100 TB these are pure map-side projections: no
  * shuffle, no state, fully inside whole-stage codegen.
  *
  * Parsing contract (deliberately simple and total): a URL is
  * `scheme://[userinfo@]host[:port][path][?query][#fragment]`. Inputs that
  * don't match the `scheme://host` prefix parse to NULL parts and a NULL
  * canonical form — coerce-don't-error, like the rest of the engine.
  */
object Urls {

  /** Lowercased scheme, or NULL if the input has no `scheme://` prefix. */
  def urlScheme(u: Column): Column =
    nullIfEmpty(lower(regexp_extract(coalesce(u, lit("")),
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))

  /** Lowercased host (authority minus userinfo/port), trailing dot
    * stripped, or NULL if unparseable.
    */
  def urlHost(u: Column): Column =
    nullIfEmpty(regexp_replace(
      lower(regexp_extract(coalesce(u, lit("")),
        "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1)),
      "\\.$", ""))

  /** Explicit port as a string ('' if absent). Internal: callers want
    * [[canonicalizeUrl]]'s default-port logic.
    */
  private def urlPort(u: Column): Column =
    regexp_extract(coalesce(u, lit("")),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)", 1)

  /** Path component including its leading '/', '' if absent. Case is
    * preserved — paths are case-sensitive, unlike scheme/host.
    */
  def urlPath(u: Column): Column =
    regexp_extract(coalesce(u, lit("")),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  /** Raw query string without the '?', '' if absent. */
  def urlQuery(u: Column): Column =
    regexp_extract(coalesce(u, lit("")), "\\?([^#]*)", 1)

  /** Registered domain from a host, public-suffix-lite rule: the last two
    * labels, or the last three when the TLD is a 2-char country code and
    * the label before it is a generic second-level prefix (co.uk, com.au,
    * ac.jp, ...). IPv4 literals are their own domain. The rule is a
    * deterministic function of the host string — no suffix-list file — so
    * the oracle replays it exactly.
    */
  def registeredDomain(host: Column): Column = {
    val h = coalesce(host, lit(""))
    val labels = split(h, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = when(n >= 2, element_at(labels, -2)).otherwise(lit(""))
    val threeLevel = n >= 3 && length(tld) === 2 &&
      sld.isin("co", "com", "net", "org", "gov", "ac", "edu")
    val last2 = concat_ws(".", element_at(labels, -2), tld)
    val last3 = when(n >= 3,
      concat_ws(".", element_at(labels, -3), element_at(labels, -2), tld))
    nullIfEmpty(
      when(h.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), h)
        .when(threeLevel, last3)
        .when(n >= 2, last2)
        .otherwise(h))
  }

  /** Query-parameter names dropped by [[canonicalizeUrl]]: the common
    * click-tracking family. A param is dropped by NAME prefix match;
    * everything else is kept in original order (no re-sorting — param
    * order can be semantic).
    */
  private val trackingParam = "^(utm_[A-Za-z0-9]*|fbclid|gclid|msclkid|ref)="

  /** Canonical form for crawl-level URL dedup:
    *   - scheme and host lowercased, trailing host dot dropped
    *   - default ports stripped (http:80, https:443); others kept
    *   - fragment dropped
    *   - tracking params (utm_*, fbclid, gclid, msclkid, ref) removed
    *   - a query left empty by that removal is dropped entirely
    *   - trailing '/' runs trimmed from the path ('/a/b/' == '/a/b'; a
    *     bare root path collapses to '')
    *   - userinfo dropped
    * NULL when the input has no parseable scheme://host. Pure projection —
    * one pass, codegen'd, no shuffle.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val keepPort = port =!= "" &&
      !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"))
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path = regexp_replace(urlPath(u), "/+$", "")
    val q = urlQuery(u)
    val kept = filter(split(q, "&"),
      p => !p.rlike(trackingParam) && p =!= "")
    val queryPart = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    when(scheme.isNotNull && host.isNotNull,
      concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  private def nullIfEmpty(c: Column): Column = when(c =!= "", c)
}
