package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/**
 * Streaming exact deduplication with explicit keyed state
 * (`flatMapGroupsWithState`) — the streaming sibling of
 * `graft.llm.ExactDedup`: the first document carrying a given content
 * hash is emitted, every later copy (same micro-batch or any later one)
 * is dropped.
 *
 * Why not `dropDuplicates`: the built-in keeps state forever (or bounds
 * it with a watermark column the data may not have); explicit
 * `GroupState` gives the knob an unbounded corpus needs — a
 * processing-time TTL per content hash, after which a recurring
 * duplicate would be re-emitted (the standard memory/recall trade for
 * infinite streams; set no TTL for exact semantics on bounded backfills).
 *
 * Scale shape: state is keyed by the 32-hex md5 of the content, so the
 * state store holds ~50 bytes per DISTINCT document ever seen (never the
 * text), sharded across executors by the same hash the groupBy shuffles
 * on — one shuffle per micro-batch, same as the batch operator.
 */
object StreamingDedup {

  /** Emitted row: the content hash and the keeper's id. */
  case class Kept(content_hash: String, keep_id: String)

  /** Keeper ordering on the stringified ids: numeric when both sides are
   *  integers (so numeric-id streams agree with the batch operator's
   *  `min(id)` — lexicographic would keep "10" over "9"), lexicographic
   *  otherwise. */
  private val IntLike = "-?\\d+".r
  private[streaming] def idLt(a: String, b: String): Boolean =
    (IntLike.matches(a), IntLike.matches(b)) match {
      case (true, true) => BigInt(a) < BigInt(b)
      case _ => a < b
    }

  /**
   * @param docs     streaming (or batch) DataFrame
   * @param idCol    id column (cast to string in the output)
   * @param textCol  content column
   * @param stateTtl processing-time TTL for a hash's "seen" state, e.g.
   *                 "24 hours"; None = keep state forever (exact, for
   *                 bounded streams)
   * @return Append-mode stream of first-seen documents. Within one
   *         micro-batch the min id wins (matching ExactDedup's
   *         `keep_id = min(id)`); across batches the earlier batch wins.
   */
  def apply(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stateTtl: Option[String] = None): Dataset[Kept] = {
    implicit val keptEnc: Encoder[Kept] = Encoders.product[Kept]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val pairEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .select(
        md5(col(textCol).cast("binary")).as("content_hash"),
        col(idCol).cast("string").as("id"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        (hash: String, rows: Iterator[(String, String)], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            // TTL expiry callback: drop the state, emit nothing
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            stateTtl.foreach(state.setTimeoutDuration) // seen again: refresh TTL
            Iterator.empty
          } else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            var keep: String = null
            while (rows.hasNext) {
              val id = rows.next()._2
              if (keep == null || (id != null && idLt(id, keep))) keep = id
            }
            Iterator.single(Kept(hash, keep))
          }
        })
  }
}
