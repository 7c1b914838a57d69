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
 * per-batch merge folds the batch into the persisted min-k and the
 * union law holds inductively — unlike a classic random-reservoir, no
 * occurrence counting or replacement probability is needed, and the
 * result is independent of batch boundaries AND replay-idempotent (a
 * re-delivered key hashes identically; the (stratum, key) dedup
 * collapses it before ranking).
 *
 * CRASH SAFETY: a merge never overwrites the table in place. The
 * merged sample is written to a FRESH versioned sibling directory and
 * swapped in with ONE atomic `ALTER TABLE ... SET LOCATION` (the
 * IndexStore swap discipline, sized down): a crash before the ALTER
 * leaves the table on its old complete data (the replayed batch
 * re-merges and converges by the semilattice law); the table itself
 * is never dropped, so the (salt, k) stamps written at creation
 * survive every merge and a stamp-less or drifted table is always
 * REFUSED as foreign. Superseded directories are retained for one
 * merge generation (a reader whose listing spans the swap finishes)
 * and reclaimed at the next merge.
 *
 * SCALE SHAPE: each merge is O(batch) — the ranking pass is the exact
 * batch sampler over (existing ∪ batch) where existing is strata×k
 * rows (model-sized, never corpus-sized), and the swap rewrites only
 * that tiny table.
 */
object StreamingSample {

  private val SaltKey = "graft.sample.salt"
  private val KKey = "graft.sample.k"

  /** Merge one batch into the persisted sample table (created at
    * `path` on first use; later merges write `path-v<n>` siblings).
    * Batch-callable — [[sink]] wraps it in foreachBatch. Returns the
    * table's row count after the merge. */
  def mergeBatch(batch: DataFrame, keyCol: String, strataCol: String,
      k: Int, salt: String, tableName: String, path: String): Long = {
    val spark = batch.sparkSession
    val slim = batch.select(col(keyCol), col(strataCol))
    val exists = spark.catalog.tableExists(tableName)
    // ONE ranking pass over (existing ∪ batch): the union operand is
    // batch-sized regardless (the table is strata×k rows), so
    // pre-ranking the batch separately would just run the exact
    // sampler's machinery twice for the same O(batch) result. The
    // (key, stratum) dedup collapses replays — an existing key
    // re-delivered would otherwise crowd the min-k window with copies.
    val merged =
      if (exists) {
        requireStamps(spark, tableName, k, salt)
        spark.catalog.refreshTable(tableName)
        Sampling.topKPerStratum(
          spark.table(tableName).unionByName(slim)
            .dropDuplicates(keyCol, strataCol),
          keyCol, strataCol, k, salt)
      } else Sampling.topKPerStratum(slim, keyCol, strataCol, k, salt)
    // eager checkpoint: the swap replaces the very data the merge reads
    val out = merged.localCheckpoint(true)
    val n = out.count()
    if (!exists) {
      out.write.option("path", path).mode("overwrite").format("parquet")
        .saveAsTable(tableName)
      spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES " +
        s"('$SaltKey'='$salt', '$KKey'='$k')")
    } else {
      val hadoopConf = spark.sessionState.newHadoopConf()
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(hadoopConf)
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val current = fs.makeQualified(new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(ident).location)).toString
      // reclaim generations from >= 2 merges ago: every base/base-v*
      // sibling except the CURRENT location (which a reader whose file
      // listing predates this swap may still be scanning)
      val parent = base.getParent
      val prefix = base.getName
      if (fs.exists(parent)) fs.listStatus(parent).foreach { st =>
        val name = st.getPath.getName
        val q = fs.makeQualified(st.getPath).toString
        if ((name == prefix || name.startsWith(prefix + "-v")) && q != current)
          fs.delete(st.getPath, true)
      }
      // fresh versioned sibling; probe-and-retry (the IndexStore rule:
      // never trust a generated path not to exist)
      val newPath = Iterator.iterate(System.currentTimeMillis())(_ + 1)
        .map(v => s"$path-v$v")
        .find(p => !fs.exists(new org.apache.hadoop.fs.Path(p)))
        .get
      out.write.mode("overwrite").parquet(newPath)
      val newQ = fs.makeQualified(new org.apache.hadoop.fs.Path(newPath))
      spark.sql(s"ALTER TABLE $tableName SET LOCATION '$newQ'")
      spark.catalog.refreshTable(tableName)
    }
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

  private def requireStamps(spark: SparkSession, tableName: String,
      k: Int, salt: String): Unit = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
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
