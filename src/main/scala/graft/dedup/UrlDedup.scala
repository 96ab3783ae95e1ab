package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical-URL deduplication — the cheapest and first dedup rung a
  * web-scale training pipeline runs (before any content hashing):
  * crawl frontiers and WARC indexes list the same page under
  * scheme/case/port/tracking-param/fragment variants, and collapsing
  * them by CANONICAL URL removes refetch duplicates at the cost of a
  * string normalization plus one hash aggregation (reference anchor:
  * the harvest layer's id-based dedup, harvest.py's OAI identifier
  * semantics — URLs are the web-corpus analog of OAI ids).
  *
  * Normalization contract (each step a codegen'd regexp, map-only;
  * the oracle implements the same CONTRACT independently in its own
  * regex dialect — RE2 has no lookarounds, so the steps avoid them):
  *  1. scheme and host lowercase (path/query case-significant),
  *  2. leading `www.` dropped from the host,
  *  3. default ports dropped (`:80` for http, `:443` for https),
  *  4. fragment dropped,
  *  5. `utm_*` tracking parameters dropped (other params kept,
  *     order preserved — full param sorting is a different, lossier
  *     policy), dangling `?`/`&` separators tidied,
  *  6. trailing path slash dropped.
  *
  * At 100 TB: the normalization is map-side; the dedup is one hash
  * aggregation keyed by canonical URL (the d1 exact-dedup shape) —
  * no pairwise work anywhere. */
object UrlDedup {

  /** The canonicalization chain, steps numbered as in the contract. */
  def canonicalizeUrl(url: Column): Column = {
    // 1. lowercase scheme://host[:port] (everything before the first
    //    path/query/fragment byte); keep the tail byte-exact
    val head = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val tail = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val u1 = concat(head, tail)
    val u2 = regexp_replace(u1, "^(https?://)www\\.", "$1")
    val u3 = regexp_replace(
      regexp_replace(u2, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    val u4 = regexp_replace(u3, "#.*$", "")
    // 5a. utm param followed by another param: drop it WITH its `&`
    // 5b. utm param last (or sole): drop it WITH its leading `?`/`&`
    // 5c. `?&` left when the first param dropped but later ones stay
    val u5 = regexp_replace(regexp_replace(regexp_replace(u4,
      "utm_[^&#]*&", ""), "[?&]utm_[^&#]*$", ""), "\\?&", "?")
    regexp_replace(regexp_replace(u5, "/$", ""), "\\?$", "")
  }

  /** Collapse rows by canonical URL: group size, kept (minimum) id,
    * and the distinct RAW variants observed — the audit column a
    * crawl-dedup report carries. One shuffle, on the canonical key. */
  def dedupByUrl(df: DataFrame, idCol: Column, urlCol: Column): DataFrame =
    df.select(idCol.as("id"), urlCol.as("url"),
        canonicalizeUrl(urlCol).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_dups"),
        min(col("id")).as("keep_id"),
        countDistinct(col("url")).as("n_variants"))
}
