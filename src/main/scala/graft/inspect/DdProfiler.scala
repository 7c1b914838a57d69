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
   *  counter). */
  def histogram(df: DataFrame, columns: Seq[String]): DataFrame =
    melt(df, columns)
      .groupBy("varname", "value")
      .agg(count(lit(1)).as("n"))

  /**
   * The per-variable profile row (dd_from_fhir.py:69-125): numeric
   * min/max (non-numeric values ignored), distinct count, and the
   * sorted distinct value list only when under `maxValues` distinct.
   */
  def profile(df: DataFrame, columns: Seq[String], maxValues: Int = 50): DataFrame = {
    val numeric = expr("try_cast(value AS double)")
    melt(df, columns)
      .groupBy("varname")
      .agg(
        // stringified with the reference's empty-cell fallback
        // (dd_from_fhir.py:110-119 leaves MIN/MAX blank when non-numeric)
        coalesce(round(min(numeric), 2).cast("string"), lit("")).as("vmin"),
        coalesce(round(max(numeric), 2).cast("string"), lit("")).as("vmax"),
        count_distinct(col("value")).as("n_distinct"),
        sort_array(collect_set(col("value"))).as("_vals"))
      .withColumn("values_list",
        when(col("n_distinct") < maxValues, array_join(col("_vals"), ";")))
      .drop("_vals")
      .orderBy("varname")
  }
}
