package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream event-time interval join — the fifth streaming
 * mechanism in the surface (after keyed state x2, watermarked windows,
 * and the stream-static join): correlate two live event streams on a
 * key within a bounded event-time window, e.g. "purchase within 30
 * minutes of a click by the same user".
 *
 * State contract (the part that matters at scale): BOTH sides carry a
 * watermark and the join condition carries a closed time interval, so
 * Spark's symmetric hash join can evict buffered rows once the other
 * side's watermark passes `ts + upper + watermark delay` — state is
 * bounded by (arrival skew + interval), NOT by stream length. Without
 * the interval bound a stream-stream inner join must buffer both
 * streams forever; this operator refuses that shape by construction
 * (`upperSec` is required).
 *
 * Inner-join semantics: a match emits when the second of its two rows
 * arrives; the watermark only bounds state and late data, so a drained
 * replay emits exactly the batch join's result (the pq56 oracle pins
 * this — streaming and batch compute the identical pair set).
 */
object StreamingJoin {

  /**
   * left ⋈ right on `keyCol` with `right.ts` in
   * `[left.ts + lowerSec, left.ts + upperSec]` (event time, inclusive).
   * Output: key, left `payloadCols` prefixed `l_`, right's prefixed
   * `r_`, plus both timestamps as `l_ts` / `r_ts`.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], lowerSec: Long, upperSec: Long,
      watermark: String = "0 seconds"): DataFrame = {
    require(upperSec >= lowerSec,
      s"intervalJoin: need upperSec >= lowerSec; got [$lowerSec, $upperSec]")
    def side(df: DataFrame, prefix: String): DataFrame =
      df.select(
        (col(keyCol).as(s"${prefix}_key") +:
          col(tsCol).as(s"${prefix}_ts") +:
          payloadCols.map(c => col(c).as(s"${prefix}_$c"))): _*)
        .withWatermark(s"${prefix}_ts", watermark)
    val l = side(left, "l")
    val r = side(right, "r")
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") + expr(s"INTERVAL $lowerSec seconds") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $upperSec seconds"))
      .withColumnRenamed("l_key", keyCol)
      .drop("r_key")
  }
}
