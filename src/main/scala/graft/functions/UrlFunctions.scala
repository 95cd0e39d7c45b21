package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup key of every web-crawl
  * pipeline (CommonCrawl/CCNet-style URL-level dedup runs BEFORE any
  * content hash: two fetches of one canonical URL are the cheapest
  * duplicates to kill). All pure per-row regex/array ops over built-in
  * functions, so the whole thing stays inside whole-stage codegen and
  * runs at scan speed — no UDF, no shuffle; mirrored 1:1 in the DuckDB
  * oracle (`q_url_canonical`).
  *
  * Contract: inputs are absolute `scheme://...` URLs (the form crawl
  * frontiers store); anything else — relative paths, `mailto:`, junk —
  * canonicalizes to NULL so malformed frontier entries can never merge
  * into one shared dedup key (an unchecked fallback would collapse ALL
  * junk URLs to a single canonical string and silently drop every later
  * one as a "duplicate"). Canonicalization = lowercase scheme + host,
  * drop userinfo, drop default ports (:80 http / :443 https), collapse
  * duplicate path slashes, strip the trailing path slash (root stays
  * `/`), drop the fragment, drop tracking query parameters
  * (utm_*, fbclid, gclid, msclkid, mc_cid, mc_eid), and sort the
  * surviving parameters byte-wise so parameter order never splits a
  * dedup group.
  */
object UrlFunctions {

  /** Query parameters stripped by [[canonicalizeUrl]] — click-tracking
    * IDs that never alter the server response. Deliberately NOT
    * included: ambiguous names like `ref`, which are functional on many
    * real sites (git-host `?ref=branch`, docs version selectors) —
    * stripping those silently merges distinct documents.
    */
  val TrackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid)="

  /** Lower-cased scheme, `""` when the URL is not absolute. */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lower-cased host with userinfo dropped; keeps any explicit port. */
  def urlHostPort(u: Column): Column =
    lower(regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^[^@]*@", ""))

  /** Host with the scheme's DEFAULT port stripped (other ports kept —
    * they address a different server).
    */
  def urlHost(u: Column): Column = {
    val hp = urlHostPort(u)
    when(urlScheme(u) === "http", regexp_replace(hp, ":80$", ""))
      .when(urlScheme(u) === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Path with duplicate slashes collapsed and the trailing slash
    * stripped; an empty path canonicalizes to `/`.
    */
  def urlPath(u: Column): Column = {
    val p = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/{2,}", "/")
    val noTrail = regexp_replace(p, "/$", "")
    when(length(noTrail) === 0, lit("/")).otherwise(noTrail)
  }

  /** Canonical query string: tracking parameters and empty fragments
    * dropped, survivors sorted; `""` when nothing survives. The match
    * anchors to the FIRST `?` (`[^#?]*` prefix) and stops at any `#`,
    * so a `?` inside the fragment (SPA hash-routes like `/#/page?tab=2`)
    * never fabricates a query, and an unencoded `?` inside a parameter
    * VALUE (redirect targets like `?url=...?x=1`) never discards the
    * real parameters before it.
    */
  def urlQueryCanon(u: Column): Column = {
    val q = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    array_join(array_sort(kept), "&")
  }

  /** Full canonical URL — see the object doc for the exact rules;
    * NULL for non-absolute input.
    */
  def canonicalizeUrl(u: Column): Column = {
    val q = urlQueryCanon(u)
    when(urlScheme(u) === "", lit(null).cast("string"))
      .otherwise(concat(urlScheme(u), lit("://"), urlHost(u), urlPath(u),
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }
}
