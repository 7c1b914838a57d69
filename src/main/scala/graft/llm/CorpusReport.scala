package graft.llm

import graft.Presented
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-call corpus curation summary — the numbers a dataset card or a
 * pre-training go/no-go review asks for first, as a tidy
 * (metric, value) frame: volume (docs, tokens), nulls/empties, exact
 * duplication, and source spread. The same facts are scattered across
 * [[TextAnalysis.corpusStats]] (per-language), [[Overlap]]
 * (per-source-pair) and the dedup operators (per-doc); this is the
 * corpus-level rollup over them all.
 *
 * Scale shape: ONE aggregate pass over the corpus computes every
 * metric — the distinct counts (16-byte content hash, source) ride the
 * same aggregate as Spark expand-mode distinct aggregations, and the
 * hottest-source count is a strata-sized groupBy branch. Values are
 * doubles (counts are exact integers in double form; ratios ROUND(6),
 * averages ROUND(4) — exact division of exact values, engine-portable
 * under rounding); metric names are stable identifiers for dashboards
 * to key on. Composition is lazy — nothing collects.
 *
 * EXACT vs APPROX: two `count_distinct`s in one aggregate plan in
 * EXPAND mode — Spark replays every corpus row once per distinct
 * column, multiplying the pass by the distinct-aggregation count.
 * Fine at audit scale; at 100 TB the `approx = true` form is the
 * default: `approx_count_distinct` (HyperLogLog++, mergeable partial
 * aggregation) keeps the single non-expanded pass and bounds the two
 * distinct-derived metrics (`n_distinct_contents`, `n_sources`, and
 * the derived `exact_dup_rate`) to the configured relative standard
 * deviation; every other metric stays exact. Same fixed row set, so
 * dashboards key identically on either mode — run exact as the audit
 * pass, approx as the recurring one.
 */
object CorpusReport {

  /** The fixed metric set, in output order. */
  val Metrics: Seq[String] = Seq(
    "n_docs", "n_null_text", "n_empty_text", "n_tokens",
    "avg_tokens_per_doc", "n_distinct_contents", "exact_dup_rate",
    "n_sources", "max_source_share")

  /**
   * @param sourceCol optional stratum column — fills `n_sources` and
   *                  `max_source_share` (the largest source's share of
   *                  docs, the "one crawl in a trenchcoat" number);
   *                  both report 0.0 when absent, keeping the row set
   *                  fixed
   * @param approx    swap the two exact distinct counts for
   *                  `approx_count_distinct` — drops the expand-mode
   *                  replay of the corpus pass; the 100 TB default
   *                  (exact stays the audit mode)
   * @param rsd       maximum relative standard deviation of the approx
   *                  distinct counts (HLL++ precision knob; ignored
   *                  when exact)
   */
  def report(df: DataFrame, idCol: String, textCol: String,
      sourceCol: Option[String] = None, ordered: Boolean = true,
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    val toks = filter(TextOps.tokens(col(textCol)), w => w =!= "")
    val base = df.select(
      col(textCol).cast("string").as("_t"),
      when(col(textCol).isNull, lit(null).cast("long"))
        .otherwise(size(toks).cast("long")).as("_n"),
      TextOps.md5Hex(col(textCol)).as("_h"),
      sourceCol.fold(lit(null).cast("string"))(c => col(c).cast("string"))
        .as("_src"))
    val agg = base.agg(
      count(lit(1)).as("n_docs"),
      count(when(col("_t").isNull, lit(1))).as("n_null"),
      count(when(col("_t").isNotNull && col("_n") === 0L, lit(1))).as("n_empty"),
      coalesce(sum("_n"), lit(0L)).as("n_tokens"),
      count(when(col("_t").isNotNull, lit(1))).as("n_text"),
      (if (approx) approx_count_distinct(col("_h"), rsd)
       else count_distinct(col("_h"))).as("n_contents"),
      (if (approx) approx_count_distinct(col("_src"), rsd)
       else count_distinct(col("_src"))).as("n_sources"))
    // hottest source: strata-sized groupBy branch (empty → 0)
    val maxSrc = base.filter(col("_src").isNotNull)
      .groupBy("_src").agg(count(lit(1)).as("_c"))
      .agg(coalesce(max("_c"), lit(0L)).as("max_src"))
    val d: String => org.apache.spark.sql.Column = n => col(n).cast("double")
    agg.crossJoin(broadcast(maxSrc))
      .select(explode(array(
        struct(lit("n_docs").as("metric"), d("n_docs").as("value")),
        struct(lit("n_null_text").as("metric"), d("n_null").as("value")),
        struct(lit("n_empty_text").as("metric"), d("n_empty").as("value")),
        struct(lit("n_tokens").as("metric"), d("n_tokens").as("value")),
        struct(lit("avg_tokens_per_doc").as("metric"),
          when(col("n_text") === 0L, lit(0.0))
            .otherwise(round(d("n_tokens") / d("n_text"), 4)).as("value")),
        struct(lit("n_distinct_contents").as("metric"), d("n_contents").as("value")),
        struct(lit("exact_dup_rate").as("metric"),
          // clamped at 0: an approx-mode HLL overestimate of contents
          // must not report a negative dup rate (no-op when exact —
          // distinct contents never exceed text docs)
          when(col("n_text") === 0L, lit(0.0))
            .otherwise(greatest(lit(0.0),
              round((d("n_text") - d("n_contents")) / d("n_text"), 6)))
            .as("value")),
        struct(lit("n_sources").as("metric"), d("n_sources").as("value")),
        struct(lit("max_source_share").as("metric"),
          when(col("n_docs") === 0L, lit(0.0))
            .otherwise(round(d("max_src") / d("n_docs"), 6)).as("value"))
      )).as("_m"))
      .select(col("_m.metric").as("metric"), col("_m.value").as("value"))
      .transform(Presented(_, ordered, "metric"))
  }
}
