package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: for every left row, the single most recent right row with
 * `right.ts <= left.ts` within the same key — the temporal lookup
 * (latest quote for a trade, latest config for an event) that SQL
 * engines ship natively (DuckDB `ASOF JOIN`, the vq oracle) and Spark
 * lacks.
 *
 * Implementation is the UNION + CARRY-FORWARD shape, not a range join:
 * tag both sides, union on (key, ts), then one window per key ordered
 * by (ts, side) carries the latest right payload forward into each left
 * row. The payload travels as ONE struct column (null on left rows), so
 * `last(_, ignoreNulls = true)` atomically picks every carried column
 * from the SAME right row — per-column carries could mix rows when a
 * payload field is legitimately null. Right rows sort BEFORE left rows
 * at equal ts, so the match is inclusive — exactly DuckDB's
 * `ON l.ts >= r.ts`.
 *
 * Scale shape: ONE shuffle on the key (both sides together), one
 * windowed sort per key partition, zero joins — each row crosses the
 * wire once. The naive alternatives both die at scale: an inequality
 * join degenerates to a per-key cross product, and a "max ts per left
 * row" subquery re-scans the right side per row. Skewed keys cost what
 * any window costs (a hot key's rows sort in one partition) — the
 * standard mitigation is time-bucketing the carry within the key, same
 * as any windowed pipeline.
 *
 * The right side must be unique per (key, ts) — pre-aggregate if not
 * (ties would make "the" matched row nondeterministic in ANY engine;
 * DuckDB's ASOF picks one arbitrarily). Output: every left row + the
 * matched right payload columns (null when no right row precedes).
 */
object AsOfJoin {

  /**
   * @param left        probe side; all its columns survive
   * @param right       reference side, unique per (key, ts)
   * @param keyCols     equality keys
   * @param tsCol       ordering column name, present on both sides
   * @param payloadCols right-side columns to carry (must not collide
   *                    with left column names; alias on the way in)
   * @param direction   "backward" (default): latest right ts <= left ts;
   *                    "forward": earliest right ts >= left ts — the
   *                    same carry-forward window scanned in descending
   *                    ts order (pandas merge_asof's direction knob)
   * @param tolerance   max |left ts - matched ts| in the ts column's
   *                    units (seconds for timestamps — a cast to double
   *                    yields epoch seconds); a nearest match farther
   *                    than this nulls out, exactly like no match
   */
  def apply(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one equality key")
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns ${payloadCols.intersect(leftCols)} collide with left columns — alias the right side")
    val reserved = Seq("_side", "_payload", "_carried")
      .filter(c => leftCols.contains(c) || right.columns.contains(c))
    require(reserved.isEmpty,
      s"columns $reserved collide with the operator's working columns — alias them away")
    val restCols = leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
    // the matched row's own ts travels inside the struct so the
    // tolerance check reads the SAME row the payload came from
    val payloadType = StructType(
      right.schema(tsCol).copy(name = "_match_ts") +: payloadCols.map(c => right.schema(c)))
    val l = left.select(
      (keyCols :+ tsCol).map(col) ++ Seq(
        lit(1).as("_side"),
        lit(null).cast(payloadType).as("_payload")) ++ restCols.map(col): _*)
    // a null-ts reference row would sort FIRST (nulls-first asc) and
    // carry its payload into every left row of the key — it carries no
    // "as of when" information, so it is dropped (left rows with a null
    // ts still come out, with no match: nothing "precedes" them)
    val r = right.filter(col(tsCol).isNotNull).select(
      (keyCols :+ tsCol).map(col) ++ Seq(
        lit(0).as("_side"),
        struct(col(tsCol).as("_match_ts") +: payloadCols.map(col): _*).as("_payload")) ++
        restCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // backward scans ascending (carry = latest ts <= current); forward
    // scans DESCENDING, so the carried row is the smallest ts >= current.
    // Right rows sort before left rows at equal ts either way: inclusive.
    val tsOrder = if (backward) col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = last(col("_payload"), ignoreNulls = true).over(w)
    val gap =
      if (backward) col(tsCol).cast("double") - col("_carried._match_ts").cast("double")
      else col("_carried._match_ts").cast("double") - col(tsCol).cast("double")
    // the left-ts null guard matters for the FORWARD scan: desc ordering
    // puts nulls LAST, so a null-ts left row would otherwise see every
    // right row and "match" the minimum-ts one — the contract is no
    // match (backward gets this for free from nulls-first asc ordering)
    val matched = col(tsCol).isNotNull && col("_carried").isNotNull
    val within = tolerance match {
      case Some(tol) => matched && gap <= tol
      case None => matched
    }
    l.unionByName(r)
      .withColumn("_carried", m)
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => when(within, col(s"_carried.$c")).as(c)): _*)
  }
}
