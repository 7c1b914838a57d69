package graft.inspect

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/**
 * Resource consumer fan-out (ref: wstlr/bundle.py:30-56 ParseBundle +
 * SURVEY.md §2.9 "one pass, multiple aggregations/side-effect sinks off
 * a cached DataFrame"): the reference streams every resource through a
 * list of consumer callbacks; the Spark shape caches the resource
 * DataFrame once and runs each consumer as its own aggregation/action
 * against the cache — one scan of the source, N cheap cache reads.
 */
object Consumers {

  final case class InspectionReport(
      moduleSummary: DataFrame,
      duplicateIdentifiers: DataFrame,
      missingResourceType: Long,
      missingIdentifier: Long,
      /** The persisted scan every aggregate reads — callers unpersist
       *  THIS when done rather than clearing the whole session cache. */
      source: DataFrame)

  /**
   * The standard inspection pass (ref: inspector.py:46-97 checks +
   * module_summary.py counts) over the projection contract
   * (module, resourceType, id, resource). Caller unpersists via the
   * returned DataFrames' lineage or spark.catalog.clearCache.
   */
  def inspect(resources: DataFrame): InspectionReport = {
    val cached = resources.persist(StorageLevel.MEMORY_AND_DISK)
    val summary = ModuleSummary(cached, "module", "resourceType")
    // identifier may be a list or a single object (ref: inspector.py:84-86
    // normalizes both); resources without one are reported separately,
    // not counted as colliding empties
    def part(field: String): Column = coalesce(
      get_json_object(col("resource"), s"$$.identifier[0].$field"),
      get_json_object(col("resource"), s"$$.identifier.$field"))
    // keep the ':' even when one side is null (the reference formats
    // f"{system}:{value}", so a system-only "X:" and a value-only ":X"
    // stay distinct — concat_ws would collapse both to "X")
    val idVal = concat(coalesce(part("system"), lit("")), lit(":"),
      coalesce(part("value"), lit("")))
    val dups = DuplicateIdentifiers(
      cached.filter(part("system").isNotNull || part("value").isNotNull),
      "resourceType", idVal)
    val noType = cached
      .filter(get_json_object(col("resource"), "$.resourceType").isNull).count()
    // ConceptMaps are exempt from the identifier requirement
    // (inspector.py:71-74)
    val noIdent = cached
      .filter(col("resourceType") =!= "ConceptMap")
      .filter(get_json_object(col("resource"), "$.identifier").isNull).count()
    InspectionReport(summary, dups, noType, noIdent, cached)
  }
}
