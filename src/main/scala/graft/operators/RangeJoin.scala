package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval) join: each point row (key, ts) matched to every
 * interval row (key, start, end) of the same key with
 * `start <= ts <= end` — one output row per overlap. The companion of
 * [[AsOfJoin]] for the "events inside sessions / readings inside
 * maintenance windows" family, which Spark only plans as a per-key
 * inequality join (a cross product within each key).
 *
 * Implementation is TIME BUCKETING: both sides key on fixed-width time
 * buckets — a point lands in exactly one bucket, an interval explodes
 * to the buckets it covers — then ONE equi-join on (key, bucket) and
 * the exact `between` filter. A point meets an interval in at most one
 * bucket (the point's own), so no post-join dedup is needed.
 *
 * Scale shape: the join is an ordinary shuffle equi-join on
 * (key, bucket) — AQE handles skew, both sides prune and pushdown as
 * usual. The interval explode factor is ceil(length / bucketWidth) + 1;
 * pick `bucketSeconds` near the TYPICAL interval length so intervals
 * expand a small constant (the classic trade: wider buckets = fewer
 * interval copies but more false candidates for the filter, narrower =
 * the reverse). Degenerate inputs (an interval spanning the whole
 * corpus) should be range-capped upstream, same as any bucketed join.
 *
 * Column contract: point and interval columns must not collide apart
 * from the keys (alias on the way in); `start > end` intervals match
 * nothing (empty bucket sequence would error — they are filtered).
 * Null bounds likewise DROP the row rather than match: an interval
 * with a null start or end filters out at the `start <= end` guard
 * (null comparison is never true), and a null-ts point gets a null
 * bucket key, which no inner equi-join row can match — the operator
 * emits only provable overlaps, exactly the `BETWEEN` oracle's
 * semantics, so "null means unbounded" callers must materialize the
 * bound (e.g. min/max of the corpus) before joining.
 */
object RangeJoin {

  def apply(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600): DataFrame = {
    require(keyCols.nonEmpty, "range join needs at least one equality key")
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val collisions = intervals.columns.toSeq.intersect(points.columns.toSeq)
      .filterNot(keyCols.contains)
    require(collisions.isEmpty,
      s"interval columns $collisions collide with point columns — alias the interval side")
    require(!points.columns.contains("_bkt") && !intervals.columns.contains("_bkt"),
      "column _bkt collides with the operator's bucket column — alias it away")
    def bkt(c: String) = floor(unix_timestamp(col(c)) / bucketSeconds)
    val p = points.withColumn("_bkt", bkt(tsCol))
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bkt", explode(sequence(bkt(startCol), bkt(endCol))))
    p.join(i, keyCols :+ "_bkt")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bkt")
  }
}
