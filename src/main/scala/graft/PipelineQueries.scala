package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Training-data-pipeline verification queries (dedup, similarity search,
 * text analysis) over the `documents` and `embeddings` tables. Populated
 * alongside graft.functions.*.
 */
object PipelineQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  def oracleSql: Map[String, String] = Map.empty
}
