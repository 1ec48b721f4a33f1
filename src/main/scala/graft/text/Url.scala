package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain rollup — the crawl
  * provenance step between fetch and dedup (every CommonCrawl-scale
  * pipeline runs one: URL-keyed exact dedup, per-domain quality
  * gating, and frontier prioritization all require that
  * `HTTP://WWW.Site.com:80/p/?utm_source=x#f` and `http://site.com/p`
  * key identically).
  *
  * Scale shape: MAP-ONLY — a chain of regex passes per row,
  * whole-stage-codegen'd, no shuffle; the domain rollup is one hash
  * aggregate on the canonical key. Patterns are RE2-safe (no
  * lookaround, no backreferences in the PATTERN — only in
  * replacements) so the Spark (Java regex) and DuckDB (RE2) dialects
  * agree symbol-for-symbol, the q_html cross-engine discipline.
  *
  * Canonicalization rules (pinned by spec + oracle, applied in order):
  *  1. fragment stripped;
  *  2. scheme + authority lowercased (path/query case preserved);
  *  3. leading `www.` dropped from the host;
  *  4. default ports dropped (`:80` for http, `:443` for https);
  *  5. tracking parameters removed (`utm_*`, `gclid`, `fbclid`),
  *     whether leading, middle, or the whole query; an emptied query
  *     loses its `?`;
  *  6. trailing slashes dropped (before `?` or end), so the root path
  *     `/` and directory-form paths normalize.
  *
  * The registrable domain is public-suffix + one label, resolved
  * against [[Psl]]'s embedded snapshot of the Mozilla public-suffix
  * list (567 listed ICANN/private entries; r16 adds the wildcard
  * `*.tld` rules and the `!www.ck` exception): exception beats all,
  * then longest suffix wins, so `a.b.github.io` rolls up to
  * `b.github.io`, `x.blogspot.com.au` IS a registrable domain, and
  * `a.edu.ck` is registrable under the `*.ck` wildcard while
  * `x.www.ck` rolls up to `www.ck` (the exception). Hosts with no
  * listed suffix take their last two labels; single-label hosts (no
  * dot) have no registrable domain (empty). The long tail of rare
  * listed entries remains a DECLARED narrowing. Still map-only: the
  * lookup is an `isInCollection` (codegen'd set probe) over the
  * split host's label slices — no join, no UDF.
  */
object Url {

  private val trackNames = "(?:utm_[a-z0-9]+|gclid|fbclid)"

  /** The canonical form of `url` per the rules above. */
  def canonicalize(url: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(url, "#.*$", "")
    // 2. lowercase scheme://authority, keep the rest as-is
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/?#]*//[^/?#]*)", 1)),
      regexp_replace(noFrag, "^[^/?#]*//[^/?#]*", ""))
    // 3. www.
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    // 4. default ports (the trailing capture keeps the char after the
    // port — RE2 has no lookahead)
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/?#:]*):80([/?#]|$)", "$1$2"),
      "^(https://[^/?#:]*):443([/?#]|$)", "$1$2")
    // 5. tracking params: non-leading first, then a leading one
    // followed by a survivor, then a lone leading one
    val noTrack = regexp_replace(regexp_replace(regexp_replace(noPort,
      "&" + trackNames + "=[^&#]*", ""),
      "\\?" + trackNames + "=[^&#]*&", "?"),
      "\\?" + trackNames + "=[^&#]*$", "")
    val noEmptyQ = regexp_replace(noTrack, "\\?$", "")
    // 6. trailing slashes
    regexp_replace(noEmptyQ, "/+(\\?|$)", "$1")
  }

  /** Host of a CANONICAL url (already lowercased, www/port-stripped). */
  def host(canonical: Column): Column =
    regexp_extract(canonical, "^https?://([^/?#:]*)", 1)

  /** Registrable domain of a host under [[Psl]]'s suffix snapshot,
    * PSL rule order (r16 adds wildcards + exceptions): an exception
    * rule wins outright (the host's last two labels ARE the
    * registrable domain — `x.www.ck` and `www.ck` both roll up to
    * `www.ck`); then the longest match — a listed 3-label suffix,
    * then a listed 2-label suffix OR a `*.tld` wildcard (both make
    * the last three labels registrable); a host that IS a listed
    * suffix — a 2-label host in the 2-list, a 3-label host in the
    * 3-list, or a 2-label host under a wildcard TLD — is itself a
    * public suffix with NO registrable domain (r17 closes the listed
    * twins of the wildcard case);
    * unlisted hosts take their last two labels; single-label hosts
    * have none. Positive-start slices keep every branch total (short
    * hosts yield short slices, and the label-count guards make the
    * branch choice exact). */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    def lastK(k: Int): Column =
      concat_ws(".", slice(parts, greatest(n - lit(k) + 1, lit(1)), lit(k)))
    val tld = element_at(parts, -1)
    when(n >= 2 && lastK(2).isInCollection(Psl.exceptions2), lastK(2))
      .when(n >= 4 && lastK(3).isInCollection(Psl.suffixes3), lastK(4))
      // a host that IS a listed suffix has NO registrable domain (r17
      // — true PSL: registration happens UNDER a public suffix, never
      // at it; the wildcard twin below always behaved this way)
      .when(n === 3 && lastK(3).isInCollection(Psl.suffixes3), lit(""))
      .when(n >= 3 && (lastK(2).isInCollection(Psl.suffixes2) ||
        tld.isInCollection(Psl.wildcardTlds)), lastK(3))
      .when(n === 2 && lastK(2).isInCollection(Psl.suffixes2), lit(""))
      .when(n >= 2 && tld.isInCollection(Psl.wildcardTlds), lit(""))
      .when(n >= 2, lastK(2))
      .otherwise(lit(""))
  }

  /** Canonicalize `url` and derive (url_canon, host, domain) columns
    * alongside the input rows. */
  def withCanonical(df: DataFrame, url: Column): DataFrame = {
    val canon = canonicalize(url)
    df.withColumn("url_canon", canon)
      .withColumn("host", host(col("url_canon")))
      .withColumn("domain", registrableDomain(col("host")))
  }

  /** Domain-grain rollup over canonicalized rows: document count,
    * distinct hosts, distinct canonical URLs (post-canonicalization
    * exact-dup keys collapse), and total characters — the per-domain
    * evidence a crawl curation pass gates on. `chars` is any per-row
    * size column. */
  def domainRollup(canonicalized: DataFrame, chars: Column): DataFrame =
    canonicalized.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("url_canon")).as("n_urls"),
        sum(chars).as("total_chars"))
}
