package graft.inspect

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * DD-profile builder — `builddd` (ref: wstlr/dd/dd_from_fhir.py:41-125):
 * profile observed data to draft a data dictionary. Per variable: a
 * value histogram, numeric min/max via try-float, and the value list
 * emitted only when the distinct count is under the cutoff (50).
 *
 * Shape: one melt (wide -> (varname, value), a zero-shuffle generator)
 * plus one hash aggregation per output — fully distributed, unlike the
 * reference's in-RAM per-variable defaultdicts.
 */
object DdProfiler {

  /** Melt the chosen columns to (varname, value-as-string) rows. */
  def melt(df: DataFrame, columns: Seq[String]): DataFrame = {
    val pairs = columns.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(explode(map(pairs: _*)).as(Seq("varname", "value")))
  }

  /** The per-(variable, value) histogram (dd_from_fhir.py:54 values
   *  counter). Null cells are absent values, not a value: counting them
   *  would make n_distinct disagree with both the emitted values_list
   *  (collect_set drops nulls) and SQL COUNT(DISTINCT). */
  def histogram(df: DataFrame, columns: Seq[String]): DataFrame =
    melt(df, columns)
      .filter(col("value").isNotNull)
      .groupBy("varname", "value")
      .agg(count(lit(1)).as("n"))

  /**
   * The per-variable profile row (dd_from_fhir.py:69-125): numeric
   * min/max (non-numeric values ignored), distinct count, and the
   * sorted distinct value list only when under `maxValues` distinct.
   *
   * Two aggregations over the (already-reduced, cached) histogram:
   * stats come from one pass, and value lists are aggregated ONLY for
   * variables under the cutoff — a high-cardinality id column never
   * funnels its distinct set into a single aggregation buffer.
   *
   * The OUTPUT is one row per profiled column — driver-sized by
   * construction (`columns` is a driver-side argument), so the stats
   * pass is collected and the result assembled as a local relation: the
   * distributed work is exactly the melt + the two histogram-level
   * aggregations, with no joins, no second histogram computation, and
   * no final shuffle. (This makes profile() eager — the reference's
   * builddd is a terminal command, never a subquery.)
   */
  def profile(df: DataFrame, columns: Seq[String], maxValues: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = df.sparkSession
    val hist = histogram(df, columns).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val numeric = expr("try_cast(value AS double)")
      // one row per profiled column
      val stats = hist
        .groupBy("varname")
        .agg(
          // stringified with the reference's empty-cell fallback
          // (dd_from_fhir.py:110-119 leaves MIN/MAX blank when non-numeric)
          coalesce(round(min(numeric), 2).cast("string"), lit("")).as("vmin"),
          coalesce(round(max(numeric), 2).cast("string"), lit("")).as("vmax"),
          count(lit(1)).as("n_distinct"))
        .collect()
        .map(r => r.getString(0) -> r).toMap
      val small = stats.collect {
        case (v, r) if r.getLong(3) < maxValues => v
      }.toSeq
      val lists: Map[String, String] =
        if (small.isEmpty) Map.empty
        else hist
          .filter(col("varname").isin(small: _*))
          .groupBy("varname")
          .agg(array_join(sort_array(collect_set(col("value"))), ";").as("values_list"))
          .collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      val out = stats.keys.toSeq.sorted.map { v =>
        val s = stats(v)
        org.apache.spark.sql.Row(v, s.getString(1), s.getString(2), s.getLong(3),
          lists.get(v).orNull)
      }
      spark.createDataFrame(
        java.util.Arrays.asList(out: _*),
        org.apache.spark.sql.types.StructType.fromDDL(
          "varname STRING, vmin STRING, vmax STRING, n_distinct BIGINT, values_list STRING"))
    } finally hist.unpersist()
  }

  /**
   * The builddd output: the profile re-emitted as a DD CSV draft
   * (ref: dd_from_fhir.py:56-67 header, 69-125 rows) that
   * [[graft.sources.DdCsv]] parses straight back — numeric-looking
   * variables drafted as `number`, enumerable value lists as bare
   * enumerations, min/max noted for the curator.
   */
  def toDdCsv(profileRows: Seq[org.apache.spark.sql.Row]): String = {
    val header = "variable_name,description,data_type,enumerations,notes"
    val lines = profileRows.map { r =>
      val (vmin, vmax) = (r.getString(1), r.getString(2))
      val dataType = if (vmin.nonEmpty) "number" else "string"
      val enums = Option(r.getString(4)).getOrElse("")
      val notes = if (vmin.nonEmpty) s"observed range $vmin..$vmax" else ""
      Seq(r.getString(0), "", dataType, enums, notes).map(cell).mkString(",")
    }
    (header +: lines).mkString("", "\n", "\n")
  }

  private def cell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
