package graft.sink

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Persistent ID cache (ref: wstlr/idcache.py:26-113): the
 * (system, unique-id) -> (resourceType, server-id) map the load/reference
 * stages share. The reference backs it with SQLite (`INSERT OR REPLACE`
 * per id, idcache.py:85-112) — single-node by construction; here the
 * backing store is parquet and the upsert is a last-wins dedup, so the
 * cache scales with the cluster and survives as ordinary columnar data.
 */
object IdCacheStore {

  val schema: StructType = StructType.fromDDL(
    "system STRING, value STRING, resource_type STRING, fhir_id STRING")

  /** Load the cache, empty when the path doesn't exist yet. */
  def load(spark: SparkSession, path: String): DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /**
   * `INSERT OR REPLACE` semantics: updates win over existing rows on the
   * (system, value) key. One shuffle on the identifier key.
   */
  def merge(existing: DataFrame, updates: DataFrame): DataFrame = {
    val all = existing.withColumn("_pri", lit(0))
      .unionByName(updates.select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .withColumn("_pri", lit(1)))
    val w = Window.partitionBy("system", "value").orderBy(desc("_pri"))
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_pri", "_rn")
  }

  /** Persist via staging-dir swap: the merged cache usually derives from
   *  a read of `path` itself, so a direct overwrite would clobber its own
   *  input mid-scan. Distributed write to staging, then an atomic-enough
   *  local rename (a cluster deployment swaps via its filesystem). */
  def save(cache: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    cache.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(staging)
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.move(java.nio.file.Paths.get(staging), p)
  }
}

/**
 * Invalid-references writer (ref: wstlr/load.py:195-222): the resources
 * still unresolved after the deferred-load fixpoint, with their missing
 * counts, merged into an existing report rather than overwriting it.
 */
object InvalidReferencesWriter {

  /** deferred: the [[ReferenceResolution.resolveLoop]] leftover —
   *  (module, resourceType, id, resource[, _missing]). */
  def toJson(deferred: DataFrame, existingJson: Option[String] = None): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = existingJson
      .map(mapper.readTree(_).asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode])
      .getOrElse(mapper.createArrayNode())
    val hasMissing = deferred.columns.contains("_missing")
    // streamed through the driver (toLocalIterator, the Sinks.scala
    // study-ids pattern): after a cold-cache run the deferred set is
    // corpus-shaped, and a collect() would double-buffer the full Row
    // array next to the growing JSON document; streaming holds one row
    // plus the document
    val it = deferred.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val o = arr.addObject()
      o.put("module", r.getAs[String]("module"))
      o.put("resourceType", r.getAs[String]("resourceType"))
      o.put("id", r.getAs[String]("id"))
      o.put("message", s"Unseen reference(s) in ${r.getAs[String]("resourceType")}/${r.getAs[String]("id")}")
      if (hasMissing) o.put("missing_references", r.getAs[Long]("_missing"))
      o.set[com.fasterxml.jackson.databind.JsonNode]("resource",
        mapper.readTree(r.getAs[String]("resource")))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }
}
