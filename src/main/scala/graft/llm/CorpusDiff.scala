package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Corpus snapshot diff — the operational primitive behind "what changed
 * between crawl N and crawl N+1": every retraining-data refresh starts
 * by classifying documents into added / removed / changed so the
 * incremental stages ([[IncrementalDedup]], [[LineDedup]], the index
 * stores) process exactly the delta instead of the corpus.
 *
 * Spark shape: each snapshot collapses to an (id, 16-byte content hash)
 * projection — the text never shuffles — and ONE full-outer equi-join
 * on the id classifies every document. `unchanged` rows (the 99%+ bulk
 * at 100 TB) are filtered out by default BEFORE anything downstream
 * materializes them; pass `includeUnchanged = true` only for audits.
 * With both snapshots stored bucketed by id ([[IndexStore]] discipline)
 * the join plans with zero exchanges.
 *
 * Null texts hash to null; two null texts compare `unchanged` (the
 * null-safe `<=>` equality). Ids must be unique and NON-NULL within a
 * snapshot — the diff contract, as for any keyed store; null-id rows
 * are excluded (a null key never equi-joins, so leaving them in would
 * fabricate a spurious added+removed pair for unchanged content).
 */
object CorpusDiff {

  /** (doc_id, status, old_hash, new_hash) with status in
    * added | removed | changed (| unchanged when included). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String, textCol: String,
      includeUnchanged: Boolean = false, ordered: Boolean = true): DataFrame = {
    val o = oldSnap.filter(col(idCol).isNotNull)
      .select(col(idCol).as("_cd_oid"), TextOps.md5Hex(col(textCol)).as("old_hash"))
    val n = newSnap.filter(col(idCol).isNotNull)
      .select(col(idCol).as("_cd_nid"), TextOps.md5Hex(col(textCol)).as("new_hash"))
    val joined = o.join(n, col("_cd_oid") === col("_cd_nid"), "full_outer")
      .select(
        coalesce(col("_cd_oid"), col("_cd_nid")).as("doc_id"),
        when(col("_cd_oid").isNull, "added")
          .when(col("_cd_nid").isNull, "removed")
          .when(col("old_hash") <=> col("new_hash"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_hash"), col("new_hash"))
    (if (includeUnchanged) joined else joined.filter(col("status") =!= "unchanged"))
      .transform(Presented(_, ordered, "doc_id"))
  }
}
