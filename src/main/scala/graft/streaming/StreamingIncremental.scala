package graft.streaming

import graft.llm.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming incremental dedup against a PERSISTED index: every arriving
 * document is classified `dup_of_history` (its content hash is already
 * in the index — `dup_of` = the historical keeper) or `new`, via a
 * STREAM-STATIC join — the streaming sibling of
 * [[graft.llm.IncrementalDedup.classify]] and the third streaming
 * mechanism in the engine (keyed state: [[StreamingDedup]] /
 * [[StreamingSessionize]]; watermarked windows:
 * [[StreamingExtract]]; stream-static join: here).
 *
 * Stateless by design: history lives in the static index relation, not
 * the state store, so ingesting a year of backfill holds ZERO streaming
 * state — Spark re-plans the static side into each micro-batch as an
 * ordinary join (broadcast when small, shuffle otherwise). In-stream
 * duplicates (two arrivals of the same unseen content) are out of
 * scope here and both classify `new`; route the stream through
 * [[StreamingDedup]] first (keyed state, min-id keeper) when in-stream
 * dedup is needed — the two compose because this operator is a pure
 * projection + join.
 *
 * Output per arrival: (doc_id, content_hash, status, dup_of) with
 * dup_of null for `new` rows — [[graft.llm.IncrementalDedup.classify]]
 * minus the in-batch tier, which is exactly what statelessness buys.
 */
object StreamingIncremental {

  /**
   * @param stream streaming DataFrame of documents
   * @param index  STATIC (content_hash, keep_id) relation —
   *               [[graft.llm.IncrementalDedup.buildIndex]] output read
   *               from its persisted location
   */
  def classify(stream: DataFrame, index: DataFrame,
      idCol: String, textCol: String): DataFrame =
    stream
      .select(col(idCol).as("doc_id"),
        TextOps.md5Hex(col(textCol)).as("content_hash"))
      .join(index.select(col("content_hash"), col("keep_id").as("_hist")),
        Seq("content_hash"), "left")
      .select(
        col("doc_id"),
        col("content_hash"),
        when(col("_hist").isNotNull, lit("dup_of_history"))
          .otherwise(lit("new")).as("status"),
        col("_hist").as("dup_of"))
}
