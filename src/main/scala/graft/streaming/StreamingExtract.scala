package graft.streaming

import graft.operators.NormalizeColumns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Structured Streaming extension (SURVEY.md §2.10). The reference is
 * strictly batch; this is the incremental-ingest path its mtime-based
 * recompute gestures at: CSV files dropped into a directory stream
 * through the SAME extraction operators.
 *
 *  - stateless operators (normalize, clean, pivot, display) apply to the
 *    streaming DataFrame directly — they are projections;
 *  - stateful shapes (group_by nesting, embed joins, the load sink) run
 *    per micro-batch via `foreachBatch`, reusing the batch pipeline
 *    verbatim — the plan SURVEY.md §2.10 prescribes;
 *  - watermarked tumbling-window aggregation is provided for the
 *    `events`-style monitoring surface.
 */
object StreamingExtract {

  /**
   * Whistler-style streaming CSV source: header skipped via schema
   * (streaming CSV cannot infer), all-string discipline preserved by the
   * caller's schema, headers normalized like the batch reader.
   */
  def csvStream(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      delimiter: String = ","): DataFrame = {
    val raw = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("quote", "\"")
      .csv(dir)
    NormalizeColumns(raw)
  }

  /**
   * Run the batch extraction (or any batch transform + sink) per
   * micro-batch. `process` receives each micro-batch as an ordinary
   * DataFrame, so GroupByNest/EmbedJoin/BundleSink/FhirLoadSink apply
   * unchanged (at-least-once per batch; the load sink's identifier
   * upsert makes redelivery effectively-once).
   */
  def perBatch(stream: DataFrame, process: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .foreachBatch((df: DataFrame, id: Long) => process(df, id))
      .trigger(Trigger.AvailableNow())

  /**
   * Watermarked tumbling-window counts over an event stream —
   * (window_start, window_end, event_type, n, total). Late rows beyond
   * the watermark are dropped; state is bounded by watermark horizon.
   */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(typeCol).as("event_type"))
      // decimal-exact sum: order-independent across partitions/engines
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol).cast("decimal(20,6)")).cast("double"), 2).as("total"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
}
