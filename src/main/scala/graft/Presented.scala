package graft

import org.apache.spark.sql.DataFrame

/**
 * Presentation-only total order, applied when `ordered` and a no-op
 * otherwise — the single point of truth for the operator-wide
 * `ordered = true` default parameter: row order carries no semantics in
 * any result that uses this, so at-scale callers pass `ordered = false`
 * (a global sort is a full range exchange) and streaming callers must
 * (a global sort is illegal on an unbounded stream). Sorts that
 * determine row MEMBERSHIP — top-k ranks, run-length ids, session
 * numbering — never route through here.
 */
object Presented {
  def apply(df: DataFrame, ordered: Boolean, cols: String*): DataFrame =
    if (ordered) df.orderBy(cols.head, cols.tail: _*) else df
}
