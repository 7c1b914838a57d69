package graft.inspect

import graft.Presented

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Inspection aggregates over projected resources
 * (ref: wstlr/inspector.py, wstlr/module_summary.py). Both are plain
 * hash aggregations — partial/map-side combinable, no driver state,
 * unlike the reference's in-RAM defaultdict accumulators.
 */
object DuplicateIdentifiers {

  /**
   * Duplicate-identifier detection (ref: wstlr/inspector.py:57-97): the
   * reference accumulates `system:value` per resourceType into sets and
   * hard-errors on a repeat; the scalable form is an aggregation
   * returning every (resourceType, identifier) seen more than once —
   * empty result = the pipeline is clean.
   *
   * One aggregation, one shuffle on the composite key. (A two-phase
   * variant — count 64-bit key hashes first, regroup only hot buckets
   * by the real composite — measured ~1.7x SLOWER at sf0.1: with
   * near-unique keys the partial aggregation barely reduces, so the
   * hash pass shuffles the same row count and the second scan +
   * regroup are pure overhead. The single shuffle is the right shape;
   * at extreme scale the win comes from AQE sizing, not key encoding.)
   *
   * @param idVal the `system:value` composite (inspector.py:90)
   */
  def apply(resources: DataFrame, typeCol: String, idVal: Column): DataFrame =
    resources
      .groupBy(col(typeCol).as("resource_type"), idVal.as("idval"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /**
   * Component-keyed form: the reference's composite is DERIVED from
   * separate fields (`system` + ':' + `value`, inspector.py:90), so
   * grouping on the raw parts matches the composite form — PROVIDED the
   * parts are non-null and separator-free. Grouping by components is
   * strictly finer otherwise: ('a:b','c') and ('a','b:c') merge under
   * the composite but split here, and concat_ws drops nulls, so
   * ('x',NULL) and (NULL,'x') both rendered 'x' under the composite.
   * Callers with free-text parts should use the composite overload.
   * The win: the shuffle carries native column values instead of
   * per-row composite strings, which are rendered only for the (rare)
   * surviving duplicate rows.
   */
  def apply(resources: DataFrame, typeCol: String, idParts: Seq[Column],
      sep: String): DataFrame = {
    val parts = idParts.zipWithIndex.map { case (c, i) => c.as(s"_p$i") }
    val partNames = idParts.indices.map(i => col(s"_p$i"))
    resources
      .groupBy((col(typeCol).as("resource_type") +: parts): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("resource_type"),
        concat_ws(sep, partNames: _*).as("idval"), col("n"))
  }

  /** True in every row iff no duplicates exist — the reference's
   *  hard-error gate as a checkable predicate. */
  def isClean(resources: DataFrame, typeCol: String, idVal: Column): Boolean =
    apply(resources, typeCol, idVal).isEmpty
}

object ModuleSummary {

  /**
   * Per-(module, resourceType) counts plus each cell's share of its
   * resource type's total (ref: wstlr/module_summary.py:9-41:
   * `module_summary` + `resource_summary` + the percent column).
   * One aggregation plus a window over the small aggregated result.
   */
  def apply(resources: DataFrame, moduleCol: String, typeCol: String,
      resourceTypes: Seq[String] = Nil, ordered: Boolean = true): DataFrame = {
    val filtered =
      if (resourceTypes.isEmpty) resources
      else resources.filter(col(typeCol).isin(resourceTypes.map(lit): _*))
    val counts = filtered
      .groupBy(col(moduleCol).as("module"), col(typeCol).as("resource_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("resource_type")
    counts
      .withColumn("pct", round(lit(100.0) * col("n") / sum(col("n")).over(w), 2))
      .transform(Presented(_, ordered, "module", "resource_type"))
  }
}
