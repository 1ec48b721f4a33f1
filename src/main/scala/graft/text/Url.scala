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
  * list (r15 — ~280 two-label ICANN/private entries plus the common
  * three-label hosting suffixes; the r14 build carried only seven):
  * longest listed suffix wins, so `a.b.github.io` rolls up to
  * `b.github.io` and `x.blogspot.com.au` IS a registrable domain.
  * Hosts with no listed suffix take their last two labels;
  * single-label hosts (no dot) have no registrable domain (empty).
  * Wildcard/exception PSL rules and the long tail of rare entries
  * remain a DECLARED narrowing. Still map-only: the lookup is an
  * `isInCollection` (codegen'd set probe) over the split host's
  * label slices — no join, no UDF.
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

  /** Registrable domain of a host under [[Psl]]'s suffix snapshot:
    * last-3-labels suffix beats last-2 beats the default two-label
    * rule; "" for single-label hosts. Positive-start slices keep
    * every branch total (short hosts yield short slices, and the
    * label-count guards make the branch choice exact). */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    def lastK(k: Int): Column =
      concat_ws(".", slice(parts, greatest(n - lit(k) + 1, lit(1)), lit(k)))
    when(n >= 4 && lastK(3).isInCollection(Psl.suffixes3), lastK(4))
      .when(n >= 3 && lastK(2).isInCollection(Psl.suffixes2), lastK(3))
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
