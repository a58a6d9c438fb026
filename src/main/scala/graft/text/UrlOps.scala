package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and registrable-domain derivation — the
  * C4/RefinedWeb ingest steps that run BEFORE any text-level dedup: a
  * web corpus's first duplicate signal is the URL itself, and its
  * domain is the unit the per-domain volume cap operates on.
  *
  * The reference engine has no URL surface (its only strings are file
  * paths, SURVEY.md §1.3); this is pipeline-extension surface like the
  * rest of [[TextOps]]. Everything is a pure codegen'd/HOF column
  * expression — per-row, zero exchanges — so the canonicalization
  * rides the scan of a 100 TB crawl for free and the only shuffle a
  * URL dedup pays is its own group-by.
  *
  * Canonical form (the standard normalizations, each one a rule a real
  * crawler applies):
  *   - fragment dropped (`#...` is client-side only);
  *   - scheme and host lowercased (case-insensitive per RFC 3986);
  *   - a leading `www.` stripped from the host;
  *   - the scheme's DEFAULT port stripped (`:80` for http, `:443` for
  *     https) — a non-default port is identity-bearing and stays;
  *   - an empty path normalized to `/`;
  *   - tracking query parameters dropped (`utm_*`, `fbclid`, `gclid`,
  *     `ref`, `mc_cid`, `mc_eid` — the C4-style strip list), the
  *     survivors SORTED by full `key=value` text and rejoined, so
  *     param order never splits a duplicate;
  *   - a query left empty by the strip loses its `?`.
  */
object UrlOps {

  /** Tracking-parameter pattern: `key=` prefixes dropped from query
    * strings. Anchored at the parameter start; values are never
    * inspected.
    */
  private val TrackingParam =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref|mc_cid|mc_eid)="

  /** The canonical URL (see object doc for the rule set). Input must be
    * an absolute `scheme://...` URL; anything unparseable passes
    * through the regexes as best-effort (no exceptions — a crawler
    * column always carries garbage rows, and dropping them is a
    * FILTER'S job, not a cast failure mid-scan).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost =
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostNoWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val rawPath = regexp_extract(
      noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    // drop empty fragments ("a&&b") and tracking params, then SORT the
    // survivors: array HOFs, evaluated once per row on a bounded array
    val params = array_sort(filter(
      split(rawQuery, "&"),
      p => p =!= "" && not(p.rlike(TrackingParam))))
    val query = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Host of a canonical URL, any explicit port stripped — the input
    * column for [[registrableDomain]].
    */
  def urlHost(canonicalUrl: Column): Column =
    regexp_replace(
      regexp_extract(canonicalUrl, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$", "")

  /** Mini public-suffix list for [[registrableDomain]], longest-match
    * entries first (the two-label suffixes must win over their
    * one-label tails: `co.uk` before `uk`). A full PSL is a data file
    * this container doesn't carry; the DERIVATION is the operator —
    * swapping in the full list changes only this constant. Fixed and
    * deterministic, so the oracle can reproduce it.
    */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "com.au", "co.jp",
    "com", "org", "net", "edu", "gov", "io", "uk")

  /** Registrable domain (eTLD+1) of a host under [[PublicSuffixes]]:
    * the longest matching suffix plus one label — the C4/RefinedWeb
    * domain-cap unit. A host that IS a bare suffix, or matches none,
    * passes through unchanged (no label to add / nothing registrable
    * to derive — the cap then groups it as itself, never drops it).
    */
  def registrableDomain(host: Column): Column = {
    val h = lower(host)
    // fold REVERSED so the list's first (longest) suffixes end up as
    // the OUTERMOST `when` branches — `co.uk` must be tested before
    // its one-label tail `uk` swallows it
    PublicSuffixes.reverse.foldLeft(h) { (acc, s) =>
      val esc = s.replace(".", "\\.")
      when(h.rlike("\\." + esc + "$"),
        regexp_extract(h, "([^.]+\\." + esc + ")$", 1))
        .otherwise(acc)
    }
  }
}
