package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling — the reproducible alternative to
 * `df.sample()` for training-data pipelines: membership is a pure
 * function of (salt, key), so the same key samples identically across
 * runs, engines, and cluster layouts (rerunning a pipeline must not
 * reshuffle the sample), and changing the salt draws an independent
 * sample for ablations.
 *
 * Mechanism: keep a row iff the first 8 hex chars of md5(salt || key)
 * fall below the rate threshold. The comparison is STRING comparison on
 * fixed-length lowercase hex, which orders exactly like the 32-bit
 * value it spells ('0'-'9' < 'a'-'f' in ASCII) — no integer parsing,
 * portable verbatim to any engine with md5(). Everything is a codegen'd
 * Column predicate: a filter on top of the scan, no shuffle, no UDF.
 *
 * Null keys have no stable identity to hash, so null-keyed rows are
 * excluded from every sample (the predicate is null -> filtered); a
 * null stratum in [[stratifiedSample]] falls through to `defaultRate`.
 */
object Sampling {

  /** The 8-hex-char threshold under which a key is in-sample:
    * floor(rate * 2^32) zero-padded — e.g. 0.5 -> "80000000". */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    f"${math.min((rate * 4294967296.0).toLong, 0xffffffffL)}%08x"
  }

  /** The literal the predicate actually compares against: "g" for
    * rate >= 1 — lexicographically above every hex char, so every
    * NON-NULL key is kept (an 8-hex threshold could never include a
    * prefix of exactly "ffffffff", and a `lit(true)` short-circuit
    * would wrongly keep null keys and diverge from the oracle's string
    * compare). One form for every rate on both engines. */
  def thresholdLiteral(rate: Double): String =
    if (rate >= 1.0) "g" else thresholdHex(rate)

  /** In-sample predicate for one key at one rate. */
  def samplePredicate(key: Column, rate: Double, salt: String = ""): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, 8) <
      lit(thresholdLiteral(rate))

  /** Uniform deterministic sample of `rate` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(samplePredicate(col(keyCol), rate, salt))

  /**
   * Stratified deterministic sample: per-stratum rates (domain mixing —
   * upsample curated sources, downsample crawl), `defaultRate` for
   * strata not in the map. One when-chain predicate on the stratum
   * column; still filter-only, no shuffle.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = ""): DataFrame = {
    val key = col(keyCol)
    val pred = rates.toSeq.sortBy(_._1).foldRight(
        samplePredicate(key, defaultRate, salt): Column) {
      case ((stratum, rate), elseExpr) =>
        when(col(strataCol) === stratum, samplePredicate(key, rate, salt))
          .otherwise(elseExpr)
    }
    df.filter(pred)
  }
}
