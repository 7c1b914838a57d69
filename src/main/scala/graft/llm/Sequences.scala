package graft.llm

import graft.Presented
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Event-sequence dataset building — the "user behavior sequence" shape
 * sequence models and recommenders train on: gap-sessionize an event
 * stream, then flatten each session into ONE training row carrying the
 * session's ordered token sequence.
 *
 * Determinism discipline: `collect_list` order is not guaranteed under
 * parallel aggregation, so the sequence collects (ts, tiebreak, token)
 * STRUCTS and `array_sort`s them before joining — the emitted string
 * is a pure function of the data under any partitioning (pinned), and
 * the (ts, tiebreak) total order matches the sessionizer's window.
 *
 * Plan: one shuffle on the key; the sessionization windows and the
 * flattening aggregate are all key-partitioned (bounded partitions —
 * a user's events, never a corpus-wide key). Oracle-pinned (pq65)
 * against STRING_AGG with the same ORDER BY.
 */
object Sequences {

  /**
   * One row per (key, session): (keyCol, session_id (1-based per key),
   * n_events, sequence). Sessions split when the gap from the previous
   * event exceeds `gapSec` (the vq22 sessionizer's rule); events order
   * by (ts, tieCol) within a session; `tokenCol` supplies the sequence
   * vocabulary. Null tokens render as empty (array_join drops them
   * would desync counts — they map to "" instead).
   */
  def sessionSequences(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, tokenCol: String, gapSec: Long = 1800L,
      ordered: Boolean = true): DataFrame = {
    require(gapSec > 0, s"sessionSequences: gapSec > 0; got $gapSec")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSess = when(prevTs.isNull ||
      unix_timestamp(col(tsCol)) - unix_timestamp(prevTs) > gapSec, 1).otherwise(0)
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("_new", newSess)
      .withColumn("session_id",
        sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col(tsCol).as("t"), col(tieCol).as("k"),
              coalesce(col(tokenCol).cast("string"), lit("")).as("tok")))),
            s => s.getField("tok")),
          " ").as("sequence"))
      .transform(Presented(_, ordered, keyCol, "session_id"))
  }
}
