package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Cross-source duplication matrix — the data-governance view of exact
 * dedup: for every unordered pair of sources, how many distinct
 * contents appear in both. This is what tells you a "new" crawl is 40%
 * re-hosted Wikipedia before you pay to dedup it document by document.
 *
 * Scale shape: ONE shuffle on the 16-byte content hash
 * (`groupBy(hash).collect_set(source)` — the set is bounded by the
 * SOURCE VOCABULARY, never row counts), then the pair explosion is a
 * codegen'd higher-order double-explode over those bounded sets,
 * feeding a pair-keyed (sources² at most) aggregate. The classic
 * hash self-join alternative is quadratic per hot hash; this shape
 * provably is not — a content shared by all S sources costs S(S-1)/2
 * pair rows once, not |rows-with-hash|². Oracle-pinned (pq62) against
 * the self-join formulation, which is set-equivalent.
 */
object Overlap {

  /** (source_a, source_b, n_shared) with source_a < source_b:
    * n_shared = distinct contents present in both sources. Null texts
    * and null sources are excluded (no identity / no owner). */
  def sourceOverlap(df: DataFrame, textCol: String, sourceCol: String,
      ordered: Boolean = true): DataFrame = {
    val perHash = df
      .filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(TextOps.md5Hex(col(textCol)).as("_h"), col(sourceCol).cast("string").as("_s"))
      .groupBy("_h").agg(sort_array(collect_set(col("_s"))).as("_ss"))
      .filter(size(col("_ss")) >= 2)
    perHash
      .select(explode(col("_ss")).as("source_a"), col("_ss"))
      .select(col("source_a"),
        explode(filter(col("_ss"), b => b > col("source_a"))).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
      .transform(Presented(_, ordered, "source_a", "source_b"))
  }
}
