package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Incremental exact dedup: classify a NEW batch of documents against a
 * persisted content-hash index of everything already accepted, without
 * rescanning the historical corpus — the shape a 100 TB training-data
 * pipeline actually runs (history is petabytes on disk; the index is one
 * ~24-byte row per distinct content).
 *
 * Statuses, in precedence order:
 *  - `dup_of_history` — content already in the index (`dup_of` = the
 *    historical keeper's id); "seen once, dropped forever".
 *  - `dup_in_batch`   — unseen content, but another batch row with a
 *    smaller id carries it (`dup_of` = that row's id).
 *  - `new`            — the batch's keeper for an unseen content.
 *
 * Scale shape: ONE shuffle of (id, hash) on the content hash covers both
 * the in-batch min-id window and the sort-merge join against the index
 * (co-partitioned on the same key); the index is never broadcast and
 * never rescans the corpus it summarizes. [[mergeIndex]] folds the
 * accepted `new` rows back in for the next run — the same last-wins
 * union-groupBy as the initial build.
 */
object IncrementalDedup {

  /** The persisted index: (content_hash, keep_id) — exactly
    * [[ExactDedup]]'s output minus the copy count. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ExactDedup(df, idCol, textCol).select("content_hash", "keep_id")

  /**
   * Classify `batch` against `index`. Output
   * (doc_id, content_hash, status, dup_of), dup_of null for `new` rows.
   */
  def classify(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val hashed = batch.select(
      col(idCol).as("doc_id"),
      TextOps.md5Hex(col(textCol)).as("content_hash"))
    val w = Window.partitionBy("content_hash")
    hashed
      .withColumn("_batch_keep", min(col("doc_id")).over(w))
      .join(index.select(col("content_hash"), col("keep_id").as("_hist")),
        Seq("content_hash"), "left")
      .select(
        col("doc_id"),
        col("content_hash"),
        when(col("_hist").isNotNull, lit("dup_of_history"))
          .when(col("doc_id") =!= col("_batch_keep"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("status"),
        when(col("_hist").isNotNull, col("_hist"))
          .when(col("doc_id") =!= col("_batch_keep"), col("_batch_keep"))
          .as("dup_of"))
  }

  /** The next run's index: history plus the batch's accepted keepers.
    * First-wins on the hash — a content already indexed keeps its
    * original keeper id (classified rows for it were dup_of_history,
    * so nothing downstream references the batch id). */
  def mergeIndex(index: DataFrame, classified: DataFrame): DataFrame =
    index.unionByName(
        classified.filter(col("status") === "new")
          .select(col("content_hash"), col("doc_id").as("keep_id")))
      .groupBy("content_hash")
      .agg(min(col("keep_id")).as("keep_id"))
}
