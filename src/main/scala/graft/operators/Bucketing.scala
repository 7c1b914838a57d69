package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table helpers for co-located joins (the brief's scale
 * toolkit: repeated large joins on the same key — e.g. the embed join's
 * parent/child tables at fact scale — should pre-bucket both sides so
 * the join runs exchange-free instead of shuffling per query).
 *
 * Spark bucketing is catalog-backed: both sides written with the same
 * bucket count and key hash-place their rows identically, and Catalyst
 * plans the equi-join without an Exchange (verified by the spec, which
 * asserts the joined plan has no hash-partitioning exchange).
 */
object Bucketing {

  /**
   * Write `df` as an external bucketed parquet table registered under
   * `tableName`. Join keys must be the leading bucket columns on BOTH
   * sides, with equal `buckets`.
   */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      keys: Seq[String],
      buckets: Int = 32): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key column")
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)
  }
}
