package graft.streaming

import graft.llm.Sampling
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Incremental per-stratum sampling against a PERSISTED sample table —
 * the maintaining-sink sibling of [[graft.llm.Sampling.topKPerStratum]]
 * for a corpus that arrives in batches: after merging batches
 * B1..Bn, the table holds EXACTLY `topKPerStratum(B1 ∪ … ∪ Bn)`
 * (the law the spec pins), with no rescan of earlier batches ever.
 *
 * WHY THIS IS EXACT: the deterministic sample keeps, per stratum, the
 * k rows with the smallest (md5(salt‖key), key) — a min-k set, which
 * is a SEMILATTICE: min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)). So the
 * per-batch merge folds the batch's own min-k into the persisted
 * min-k and the union law holds inductively — unlike a classic
 * random-reservoir, no occurrence counting or replacement probability
 * is needed, and the result is independent of batch boundaries AND
 * replay-idempotent (a re-delivered key hashes identically; the
 * (stratum, key) dedup collapses it before ranking).
 *
 * SCALE SHAPE: each merge is O(batch) — the batch ranks with the
 * batch-side operator (rank-limit pushdown keeps it partition-local),
 * the persisted table is strata×k rows (model-sized, never
 * corpus-sized), and the overwrite rewrites only that tiny table. The
 * (salt, k) pair is STAMPED as table properties; a drifted merge
 * fails fast instead of silently mixing two different samples.
 */
object StreamingSample {

  private val SaltKey = "graft.sample.salt"
  private val KKey = "graft.sample.k"

  /** Merge one batch into the persisted sample table (created at
    * `path` on first use). Batch-callable — [[sink]] wraps it in
    * foreachBatch. Returns the table's row count after the merge. */
  def mergeBatch(batch: DataFrame, keyCol: String, strataCol: String,
      k: Int, salt: String, tableName: String, path: String): Long = {
    val spark = batch.sparkSession
    val slim = batch.select(col(keyCol), col(strataCol))
    // ONE ranking pass over (existing ∪ batch): the union operand is
    // batch-sized regardless (the table is strata×k rows), so
    // pre-ranking the batch separately would just run the exact
    // sampler's machinery twice for the same O(batch) result. The
    // (key, stratum) dedup collapses replays — an existing key
    // re-delivered would otherwise crowd the min-k window with copies.
    val merged =
      if (spark.catalog.tableExists(tableName)) {
        // crash recovery: the overwrite below recreates the table and a
        // separate ALTER re-stamps it, so a crash in between leaves a
        // stamp-LESS table — our own committed merge, not foreign data.
        // Refusing it would wedge every replay (mergeBatch is the only
        // thing that can re-create the stamps); merging through it is
        // safe because the semilattice law makes re-merging converge.
        // A PARTIAL or MISMATCHED stamp is still genuine drift → refuse.
        if (readStamps(spark, tableName).nonEmpty)
          requireStamps(spark, tableName, k, salt)
        spark.catalog.refreshTable(tableName)
        Sampling.topKPerStratum(
          spark.table(tableName).unionByName(slim)
            .dropDuplicates(keyCol, strataCol),
          keyCol, strataCol, k, salt)
      } else Sampling.topKPerStratum(slim, keyCol, strataCol, k, salt)
    // eager checkpoint: the overwrite replaces the very table the
    // merge reads (the appendExactKeepers discipline)
    val out = merged.localCheckpoint(true)
    val n = out.count()
    out.write.option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(tableName)
    spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES " +
      s"('$SaltKey'='$salt', '$KKey'='$k')")
    n
  }

  /** The current sample, parameter-checked against the stamps. */
  def sample(spark: SparkSession, tableName: String, k: Int,
      salt: String): DataFrame = {
    requireStamps(spark, tableName, k, salt)
    spark.catalog.refreshTable(tableName)
    spark.table(tableName)
  }

  /** The maintaining streaming sink: [[mergeBatch]] per micro-batch.
    * Caller sets checkpointLocation/trigger and `.start()`s it. Replay
    * convergence is the semilattice law — a re-delivered batch merges
    * to the identical table. */
  def sink(stream: DataFrame, keyCol: String, strataCol: String,
      k: Int, salt: String, tableName: String, path: String,
      onBatch: (Long, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onBatch(mergeBatch(batch, keyCol, strataCol, k, salt, tableName, path),
        batchId)
    }

  /** The (salt, k) stamps present on the table — empty right after a
    * crash between [[mergeBatch]]'s overwrite and its re-ALTER. */
  private def readStamps(spark: SparkSession,
      tableName: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .filter { case (key, _) => key == SaltKey || key == KKey }

  private def requireStamps(spark: SparkSession, tableName: String,
      k: Int, salt: String): Unit = {
    val props = readStamps(spark, tableName)
    def stamp(key: String): String = props.getOrElse(key, sys.error(
      s"$tableName carries no $key stamp — not a StreamingSample table; " +
        "re-create through mergeBatch"))
    require(stamp(SaltKey) == salt && stamp(KKey) == k.toString,
      s"$tableName was built with salt=${stamp(SaltKey)} k=${stamp(KKey)}, " +
        s"but this merge uses salt=$salt k=$k — mixing samples built on " +
        "different knobs silently corrupts the min-k law; rebuild or pass " +
        "the stamped knobs")
  }
}
