package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * URL canonicalization — the key-normalization pass crawl dedup runs
 * before URL-keyed joins (recrawls of one page arrive under dozens of
 * spellings; dedup on the raw string misses nearly all of them):
 *
 *  1. trim;
 *  2. fragment drops (`#...` never reaches the server);
 *  3. scheme + host lowercase (RFC 3986 §6.2.2.1 — scheme and host are
 *     case-insensitive; userinfo, path, and query case are preserved);
 *  4. default ports drop (`:80` for http, `:443` for https);
 *  5. tracking parameters drop (`utm_*`, `gclid`, `fbclid`) with
 *     separator repair (`?utm_a=1&q=2` → `?q=2`, a lone tracker drops
 *     its `?`);
 *  6. an empty path on an authority URL becomes `/` (RFC 3986 §6.2.3).
 *
 * Pure codegen'd Column chain — regexp_replace/regexp_extract in the
 * Java-regex ∩ RE2 common subset (no lookarounds; unmatched optional
 * groups substitute "" in both engines), zero shuffle, zero UDF,
 * null-preserving — oracle-pinned stage-for-stage in DuckDB (pq69).
 * Scheme-less strings pass through steps 3/4/6 untouched (no authority
 * to normalize) — garbage in, unchanged garbage out, for the quality
 * gate to drop.
 */
object UrlOps {

  /** scheme:// | userinfo@ (case-SENSITIVE per RFC 3986 §6.2.2.1 — only
    * scheme and host fold) | host[:port] | rest. */
  private val SchemeUA =
    "(?s)^([A-Za-z][A-Za-z0-9+.-]*://)((?:[^/?#]*@)?)([^/?#]*)(.*)$"

  /** The canonicalization chain as a reusable Column expression. */
  def canonicalize(url: Column): Column = {
    val t = trim(url)
    val noFrag = regexp_replace(t, "(?s)#.*", "")
    val lowered = when(noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(lower(regexp_extract(noFrag, SchemeUA, 1)),
        regexp_extract(noFrag, SchemeUA, 2),
        lower(regexp_extract(noFrag, SchemeUA, 3)),
        regexp_extract(noFrag, SchemeUA, 4))).otherwise(noFrag)
    val noPort = regexp_replace(
      regexp_replace(lowered, "(?s)^(http://[^/?#]*):80([/?#].*)?$", "$1$2"),
      "(?s)^(https://[^/?#]*):443([/?#].*)?$", "$1$2")
    // tracking params live in the QUERY STRING only: '&' is a legal
    // path character (RFC 3986 sub-delim), so the rules run on the
    // split-off '?...' part and the path passes through verbatim
    val preQ = regexp_extract(noPort, "(?s)^([^?]*)", 1)
    val qPart = regexp_extract(noPort, "(?s)^[^?]*(\\?.*)$", 1)
    val qClean = regexp_replace(
      regexp_replace(
        regexp_replace(qPart, "&(utm_[^=&]*|gclid|fbclid)=[^&]*", ""),
        "^\\?(utm_[^=&]*|gclid|fbclid)=[^&]*&", "?"),
      "^\\?(utm_[^=&]*|gclid|fbclid)=[^&]*$", "")
    val noTrack = concat(preQ, qClean)
    regexp_replace(noTrack,
      "(?s)^([a-z][a-z0-9+.-]*://[^/?#]+)(\\?.*)?$", "$1/$2")
  }

  /** (idCol, canonical): the canonical form of `urlCol` per row. */
  def canonicalizeUrls(df: DataFrame, idCol: String, urlCol: String,
      ordered: Boolean = true): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("canonical"))
      .transform(Presented(_, ordered, idCol))

  /** URL-keyed dedup: [[ExactDedup]] over the canonical form — one row
    * per distinct canonical URL (content_hash, keep_id = min id,
    * n_copies), one shuffle on the 16-byte hash. The canonicalization
    * is pinned by pq69; the grouping semantics are ExactDedup's (pq1). */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    ExactDedup(canonicalizeUrls(df, idCol, urlCol, ordered = false),
      idCol, "canonical")

  /** HOST of a URL: the [[canonicalize]]d form's authority minus
    * userinfo and port — already lowercased by the canonical chain.
    * NULL for scheme-less strings (no authority to name) and for an
    * empty authority; that null is a GROUP, not an error — the
    * host-keyed operators below treat "no host" as its own stratum so
    * garbage rows surface in reports instead of vanishing. Bracketed
    * IPv6 literals are out of scope (the first ':' ends the host —
    * crawl corpora key on hostnames). Same Java-regex ∩ RE2 subset as
    * the canonical chain. */
  def host(url: Column): Column = {
    val h = regexp_extract(canonicalize(url),
      "(?s)^([a-z][a-z0-9+.-]*)://(?:[^/?#]*@)?([^/:?#]+)", 2)
    when(length(h) > 0, h)
  }

  /**
   * Per-host corpus footprint — the FineWeb/RefinedWeb-style source
   * report that decides host-level curation (one spam host flooding
   * the mix is the classic crawl pathology): (host, n_docs, n_tokens,
   * doc_share) per distinct host, null host = the no-authority group.
   *
   * Scale shape: ONE host-keyed map-side-combined aggregate (the host
   * projection is a codegen'd regex chain on the scan — URLs never
   * shuffle raw; the host vocabulary bounds the result), plus a
   * broadcast one-row total for the share. doc_share is ROUND(6) of
   * one exact-BIGINT division (values, never membership).
   */
  def hostStats(df: DataFrame, urlCol: String, tokensCol: String,
      ordered: Boolean = true): DataFrame = {
    val agg = df
      .select(host(col(urlCol)).as("host"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("_t"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("n_tokens"))
    val total = df.select(count(lit(1)).cast("double").as("_total"))
    agg.crossJoin(broadcast(total))
      .withColumn("doc_share", round(col("n_docs") / col("_total"), 6))
      .drop("_total")
      .transform(Presented(_, ordered, "host"))
  }

  /** Per-host document CAP — the anti-spam curation step: keep at most
    * `k` docs per host, the deterministic smallest-(md5(salt,key), key)
    * survivors, so the kept set is a pure function of (salt, keys) and
    * re-crawls keep the same docs. Hosts under the cap keep everything;
    * the null-host group is capped like any other (garbage shouldn't
    * flood the mix either). Pure composition: the [[host]] projection
    * feeding [[Sampling.topKPerStratum]] with the host as the stratum —
    * one codegen'd prefilter + a survivor-bounded window, never a
    * window over the raw Zipfian host key. Output: the surviving input
    * rows, original columns. */
  def capPerHost(df: DataFrame, idCol: String, urlCol: String, k: Int,
      salt: String = "", safety: Double = 4.0): DataFrame =
    Sampling.topKPerStratum(
        df.withColumn("_uh_host", host(col(urlCol))),
        idCol, "_uh_host", k, salt, safety)
      .drop("_uh_host")
}
