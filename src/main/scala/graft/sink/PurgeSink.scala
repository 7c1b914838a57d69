package graft.sink

import graft.cli.PurgeOrder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/**
 * The purge executor (ref: wstlr/purge.py:100-160): delete a study's
 * resources in reverse dependency order — unknown types first, then the
 * fixed creation order reversed — deferring conflicts (409: something
 * still references the resource) to bounded retry rounds.
 *
 * Spark shape: one job per dependency tier (cross-tier ordering is the
 * semantic; intra-tier deletes run with executor parallelism, like the
 * reference's thread pool), then a driver retry loop over the deferred
 * set (ref: purge.py:130-157 — 5 rounds; the reference sleeps 60 s per
 * round, configurable here so tests don't).
 */
object PurgeSink {

  /** One delete attempt: true = gone, false = conflict (defer and
   *  retry), throw = hard error (recorded, not retried). */
  type Deleter = (String, String) => Boolean

  private val resultSchema = StructType(Seq(
    StructField("resource_type", StringType),
    StructField("id", StringType),
    StructField("status", StringType), // deleted | deferred | error
    StructField("error", StringType, nullable = true)))

  private def deleteTier(tier: DataFrame, makeDeleter: () => Deleter): DataFrame =
    tier.select(col("resource_type"), col("id")).mapPartitions { rows =>
      val deleter = makeDeleter()
      rows.map { r =>
        val (rt, id) = (r.getString(0), r.getString(1))
        try {
          if (deleter(rt, id)) Row(rt, id, "deleted", null)
          else Row(rt, id, "deferred", null)
        } catch {
          case e: Exception => Row(rt, id, "error", e.getMessage)
        }
      }
    }(Encoders.row(resultSchema))

  /**
   * Purge `ids` (resource_type, id). Runs one initial delete pass plus up
   * to `maxRounds` RETRY rounds, each preceded by a sleep — exactly the
   * reference's shape (purge.py:112-119 initial pass, then `for i in
   * range(0, 5)` with sleep(60) at :133-136). Returns the final per-id
   * statuses; ids still `deferred` at the end could not be deleted
   * (purge.py:154-157 reports them).
   */
  def purge(
      ids: DataFrame,
      makeDeleter: () => Deleter,
      maxRounds: Int = 5,
      sleepMillis: Long = 60000L): DataFrame = {
    val spark = ids.sparkSession
    var pending = ids.select(col("resource_type"), col("id"))
    var finished = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], resultSchema)
    var round = 0
    while (round <= maxRounds && !pending.isEmpty) {
      if (round > 0) Thread.sleep(sleepMillis) // give the server time (purge.py:135-137)
      // tiers in delete order: unknown types first, then reverse creation.
      // The collect is DISTINCT TYPES only — bounded by the FHIR resource
      // type vocabulary (~150), never the id list, at any corpus scale
      val types = pending.select("resource_type").distinct()
        .collect().map(_.getString(0)).toSeq
      val ordered = PurgeOrder.deleteOrder(types)
      val roundResults = ordered.map { rt =>
        // eager localCheckpoint: one execution per tier, in tier order —
        // side-effecting deletes must never re-run via lineage replay
        deleteTier(pending.filter(col("resource_type") === rt), makeDeleter)
          .localCheckpoint(true)
      }
      val all = roundResults.reduce(_ unionByName _)
      finished = finished.unionByName(all.filter(col("status") =!= "deferred"))
      pending = all.filter(col("status") === "deferred").select("resource_type", "id")
      round += 1
    }
    finished.unionByName(
      pending.withColumn("status", lit("deferred")).withColumn("error", lit(null).cast("string")))
  }
}
