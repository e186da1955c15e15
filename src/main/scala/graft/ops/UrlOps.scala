package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** URL canonicalization and URL-level deduplication — the step a crawl
  * pipeline runs BEFORE any content dedup: the same page fetched as
  * `HTTP://Example.com:80/a?utm_source=x&b=2&a=1#frag` and
  * `http://example.com/a?a=1&b=2` must collapse to one fetch slot, or
  * every downstream stage (minhash, quality, token counts) pays for the
  * copy. Reference scope: the reference has no crawl layer; this is
  * beyond-reference pipeline surface, kept engine-portable so the
  * DuckDB oracle can replay every rule.
  *
  * The canonical form applies, in order:
  *   1. trim surrounding whitespace;
  *   2. strip the fragment (`#...` — client-side only, never a
  *      different resource);
  *   3. lowercase the scheme and authority (host names are
  *      case-insensitive; paths are NOT touched);
  *   4. drop explicit default ports (`:80` for http, `:443` for https);
  *   5. drop tracking parameters (`utm_*`, `gclid`, `fbclid`,
  *      `msclkid`) — analytics decoration, not content identity;
  *   6. sort surviving query parameters byte-wise (param order is
  *      semantically irrelevant for the overwhelming majority of
  *      endpoints; sorting makes the two orderings collide);
  *   7. drop an empty trailing `?`.
  *
  * Deliberately NOT applied (each changes resource identity for some
  * hosts, so a canonicalizer that applies them over-merges): `www.`
  * stripping, trailing-slash stripping, percent-decoding, and
  * `index.html` removal.
  *
  * Everything is a pure column expression over Spark's built-in
  * string/regexp/array functions — no UDF, no lookaround (RE2-safe for
  * the oracle), scan-speed at any corpus size.
  */
object UrlOps {

  private val TrackingParam = "(?:utm_[^=&#]*|gclid|fbclid|msclkid)=[^&#]*"

  /** Canonical form of one URL column (rules in the object scaladoc).
    * Non-URL strings pass through rules that don't match them — the
    * function never nulls out or throws on junk input (crawl frontiers
    * are full of it); callers filter with a scheme predicate first if
    * they need URLs only. */
  def canonicalizeUrl(url: Column): Column = {
    val t0 = trim(url)
    // rule 2: fragment off first, so later regexes never see '#'
    val noFrag = regexp_replace(t0, "#.*", "")
    // rule 3: lowercase "scheme://authority" prefix, keep the rest as-is
    val prefix = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val lowered = when(length(prefix) > 0,
      concat(lower(prefix), noFrag.substr(length(prefix) + 1, length(noFrag))))
      .otherwise(noFrag)
    // rule 4: default ports (authority already lowercased). No
    // lookahead — RE2 (the oracle's engine) has none, so the delimiter
    // is captured and restored instead
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#:]+):80([/?]|$)", "$1$2"),
      "^(https://[^/?#:]+):443([/?]|$)", "$1$2")
    // rules 5-7 operate on the query string alone
    val q = regexp_extract(noPort, "\\?(.*)", 1)
    val base = when(length(q) > 0,
      noPort.substr(lit(1), length(noPort) - length(q) - 1))
      .otherwise(noPort)
    // tracking params out (each match consumes its leading '&' or sits
    // at ^), then a stranded leading '&' from a removed head param
    val cleaned = regexp_replace(
      regexp_replace(q, "(?:^|&)" + TrackingParam, ""), "^&", "")
    // empty segments (trailing or doubled '&' — '?a=1&', '?a=1&&b=2')
    // are dropped BEFORE sorting: empties sort first and would otherwise
    // yield canonicals like '...?&a=1' that fail to collapse with '?a=1'
    val sortedQ = array_join(sort_array(
      filter(split(cleaned, "&"), s => length(s) > 0)), "&")
    // instr, not length(q): an empty CAPTURE can't tell "no '?'" from a
    // bare trailing '?', which rule 7 must still strip
    when(instr(noPort, "?") === 0, noPort)
      .when(length(sortedQ) > 0, concat(base, lit("?"), sortedQ))
      .when(length(q) > 0, base) // every param was tracking → '?' gone
      .otherwise(noPort.substr(lit(1), length(noPort) - 1)) // bare '?'
  }

  /** The registrable host of a canonical URL — the per-domain cap /
    * frontier-sharding key. Empty string for non-URL input. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))

  /** URL-level exact dedup: one row per canonical URL, the minimum-id
    * row winning (stable across partition layouts; `min` over the id's
    * OWN type — numeric ids win numerically, string/UUID ids
    * lexicographically — so no cast can null out a non-numeric id and
    * silently drop rows). The same collapse-first shape as content
    * dedup — group to winners, then one semi join back — so the shuffle
    * carries (canonical, id) pairs, never document payloads, and the
    * winner set is as small as the unique-URL count. Rows whose
    * `urlCol` is null pass through untouched (no URL ≠ duplicate URL). */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    val winners = df.filter(col(urlCol).isNotNull)
      .select(canon.as("__cu"), col(idCol).as("__uid"))
      .groupBy(col("__cu")).agg(min(col("__uid")).as("__keep"))
      .select(col("__keep"))
    df.filter(col(urlCol).isNull).unionByName(
      df.filter(col(urlCol).isNotNull)
        .join(winners, col(idCol) === col("__keep"), "left_semi"))
  }
}
