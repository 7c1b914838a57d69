package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed, catalog-backed persistence for the incremental-dedup
 * indexes — the storage half of the every-batch classify join.
 *
 * WHY BUCKETED: [[IncrementalDedup.classify]] equi-joins each batch
 * against the exact index on `content_hash`, and
 * [[IncrementalMinHash.classifyBanded]] against the banded sketch index
 * on (band_idx, band_key). At 100 TB corpus scale the index is
 * terabyte-scale, and a plain parquet index pays a full exchange of
 * that index EVERY batch. Writing it `bucketBy` the join key gives the
 * scan a hash partitioning Catalyst recognizes (v1 bucketing hashes
 * with the same murmur3 as a shuffle), so the history join plans with
 * ZERO exchange above the index scan — only the batch-derived side
 * shuffles, into the bucket count. Pinned in PlanAssertionsSpec.
 *
 * WHY APPEND: the classify/merge cycle only ever ADDS rows for contents
 * the index has never seen (`status = new` keepers), so the per-batch
 * index write is an O(batch) bucketed APPEND, not the O(corpus) rewrite
 * [[IncrementalDedup.mergeIndex]] performs on DataFrames. Uniqueness is
 * maintained by construction: a batch keeper is appended only when its
 * hash missed the index it was classified against. Appends add one file
 * per bucket per batch; Spark unions a bucket's files in one task, so
 * the JOIN shape is unchanged, but scan parallelism is bucket-bound and
 * file counts grow per batch — run [[compactExact]]/[[compactMinhash]]
 * on a cadence (e.g. every ~100 batches, or when files-per-bucket
 * exceeds the HDFS/object-store small-file comfort zone) to rewrite the
 * table to one file per bucket. SCALE.md §"Incremental index growth"
 * carries the runbook.
 *
 * BUCKET COUNT: `buckets` defaults to 32 to match the session's
 * `spark.sql.shuffle.partitions` — when the two are equal, the batch
 * side's existing hash partitioning (from the keeper aggregate) is
 * co-partitioned with the index scan and the second join inserts no
 * extra exchange at all. Size it like shuffle partitions: index rows /
 * buckets should fit a task comfortably (the exact index is ~24 bytes
 * per distinct content — even 10^12 contents over 4096 buckets is ~6 GB
 * a bucket; pick thousands of buckets at that scale).
 *
 * The table name is a catalog identifier; `path` places the parquet
 * files (external table), so the catalog entry is metadata only.
 */
object IndexStore {

  private def writeBucketed(df: DataFrame, tableName: String, path: String,
      buckets: Int, keys: Seq[String], mode: String): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // Repartition on the bucket keys into exactly `buckets` partitions:
    // Spark's HashPartitioning uses the same murmur3 hash as v1 bucket
    // assignment, so each write task then holds exactly ONE bucket and
    // emits exactly one file for it. Without this, every scan task
    // writes a file for every bucket it happens to hold — a compaction
    // that reads 3 appends' files would emit 3 × buckets files and not
    // compact at all (and an N-task append would emit up to N × buckets
    // files instead of the one-file-per-bucket-per-batch the growth
    // model promises).
    df.repartition(buckets, keys.map(col): _*).write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode(mode)
      .format("parquet")
      .saveAsTable(tableName)
  }

  // ------------------------------------------------------------------
  // Exact index: (content_hash, keep_id), bucketed by content_hash
  // ------------------------------------------------------------------

  /** Write an exact-dedup index ([[IncrementalDedup.buildIndex]] /
    * [[IncrementalDedup.mergeIndex]] output) as a bucketed external
    * table. Overwrites. */
  def saveExact(index: DataFrame, tableName: String, path: String,
      buckets: Int = 32): Unit =
    writeBucketed(
      // belt-and-braces sentinel normalization: classify consumes the
      // stored column RAW (a read-side coalesce would discard the
      // bucketed partitioning), so normalization must happen here
      index.select(coalesce(col("content_hash"), lit("-")).as("content_hash"),
        col("keep_id")),
      tableName, path, buckets, Seq("content_hash"), "overwrite")

  /** The bucketed exact index, ready for [[IncrementalDedup.classify]]. */
  def exactIndex(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** O(batch) index maintenance: append the batch's accepted keepers
    * (`status = new` rows of a [[IncrementalDedup.classify]] result
    * that was computed AGAINST THIS TABLE — that precondition is what
    * keeps content_hash unique without a merge). */
  def appendExactKeepers(classified: DataFrame, tableName: String): Unit = {
    val spark = classified.sparkSession
    val (buckets, keys) = bucketSpecOf(spark, tableName)
    require(keys == Seq("content_hash"),
      s"$tableName is not an exact-dedup index table (bucket keys $keys)")
    val path = tablePath(spark, tableName)
    writeBucketed(
      classified.filter(col("status") === "new")
        .select(col("content_hash"), col("doc_id").as("keep_id")),
      tableName, path, buckets, keys, "append")
  }

  /** Rewrite the (append-accumulated) exact index into `toTable` with
    * one file per bucket. Contents are identical rows (the append
    * invariant keeps content_hash unique; this is a file-layout
    * compaction, not a merge) — pinned by the compaction law spec.
    * Writes to a NEW table/path: Spark cannot overwrite a table from a
    * plan that reads it; swap names afterwards if desired. */
  def compactExact(spark: SparkSession, fromTable: String, toTable: String,
      toPath: String, buckets: Int = 32): Unit =
    saveExact(spark.table(fromTable), toTable, toPath, buckets)

  // ------------------------------------------------------------------
  // MinHash banded index: (band_idx, band_key, keep_id, sig),
  // bucketed by (band_idx, band_key)
  // ------------------------------------------------------------------

  /** Sketch parameters stamped on the table so a later classify with
    * different parameters fails fast instead of silently missing
    * matches (the per-row width/band guards catch most mismatches; the
    * properties catch them all, before any job runs). */
  private def minhashProps(shingleN: Int, numHashes: Int, bands: Int) = Seq(
    "graft.shingleN" -> shingleN.toString,
    "graft.numHashes" -> numHashes.toString,
    "graft.bands" -> bands.toString)

  /** Write a MinHash sketch index ([[IncrementalMinHash.buildIndex]]
    * output) as a band-exploded bucketed external table. Overwrites. */
  def saveMinhash(index: DataFrame, tableName: String, path: String,
      buckets: Int = 32, shingleN: Int = 3, numHashes: Int = 9,
      bands: Int = 3): Unit = {
    val spark = index.sparkSession
    writeBucketed(IncrementalMinHash.bandedIndex(index), tableName, path,
      buckets, Seq("band_idx", "band_key"), "overwrite")
    val props = minhashProps(shingleN, numHashes, bands)
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES ($props)")
  }

  /** Parameter-drift guard against the table's stamped properties.
    * A MISSING key fails too: a table that lost its stamp (written by
    * an older save, or an ALTER dropped it) would otherwise pass the
    * check silently and a drifted read would return garbage — the
    * exact failure the stamp exists to prevent. */
  private def requireStamped(spark: SparkSession, tableName: String,
      expected: Seq[(String, String)]): Unit = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    expected.foreach { case (k, exp) =>
      props.get(k) match {
        case None => throw new IllegalArgumentException(
          s"$tableName carries no stamped $k property, so parameter drift " +
            "cannot be checked — re-save the index through IndexStore (or " +
            s"restore the property: ALTER TABLE $tableName SET TBLPROPERTIES " +
            s"('$k'='<value it was built with>'))")
        case Some(actual) => require(actual == exp,
          s"$tableName was built with $k=$actual, but this call expects " +
            s"$exp — rebuild the index or pass the parameters it was " +
            "built with")
      }
    }
  }

  /** The banded index, parameter-checked against the table's stamped
    * sketch parameters, ready for
    * [[IncrementalMinHash.classifyBanded]]. */
  def minhashIndex(spark: SparkSession, tableName: String,
      shingleN: Int = 3, numHashes: Int = 9, bands: Int = 3): DataFrame = {
    requireStamped(spark, tableName, minhashProps(shingleN, numHashes, bands))
    spark.table(tableName)
  }

  /** O(batch) index maintenance for the sketch index: append the banded
    * sketch rows of the batch's accepted `new` docs (recomputed on that
    * small subset, exactly [[IncrementalMinHash.mergeIndex]]'s shape). */
  def appendMinhashAccepted(batch: DataFrame, classified: DataFrame,
      idCol: String, textCol: String, tableName: String,
      shingleN: Int = 3, numHashes: Int = 9, bands: Int = 3): Unit = {
    val spark = batch.sparkSession
    val (buckets, keys) = bucketSpecOf(spark, tableName)
    require(keys == Seq("band_idx", "band_key"),
      s"$tableName is not a minhash index table (bucket keys $keys)")
    // fail fast on parameter drift before any job runs
    minhashIndex(spark, tableName, shingleN, numHashes, bands)
    val accepted = batch.join(
      classified.filter(col("status") === "new")
        .select(col("doc_id").as("_accepted_id")),
      batch(idCol).cast("long") === col("_accepted_id")).drop("_accepted_id")
    writeBucketed(
      IncrementalMinHash.bandedIndex(IncrementalMinHash.buildIndex(
        accepted, idCol, textCol, shingleN, numHashes, bands)),
      tableName, tablePath(spark, tableName), buckets, keys, "append")
  }

  /** File-layout compaction for the banded index — see [[compactExact]]. */
  def compactMinhash(spark: SparkSession, fromTable: String, toTable: String,
      toPath: String, buckets: Int = 32): Unit = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $fromTable").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    writeBucketed(spark.table(fromTable), toTable, toPath, buckets,
      Seq("band_idx", "band_key"), "overwrite")
    val carried = minhashProps(
      props.getOrElse("graft.shingleN", "3").toInt,
      props.getOrElse("graft.numHashes", "9").toInt,
      props.getOrElse("graft.bands", "3").toInt)
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $toTable SET TBLPROPERTIES ($carried)")
  }

  // ------------------------------------------------------------------
  // IVF-PQ coded index: (id, codes, list), PARTITIONED by list
  // ------------------------------------------------------------------

  /** Parameters stamped so a probe with a drifted model fails fast —
    * codes against the wrong codebooks are silent garbage distances. */
  private def ivfProps(nlist: Int, m: Int) = Seq(
    "graft.nlist" -> nlist.toString, "graft.m" -> m.toString)

  /**
   * Persist a [[ProductQuant.buildCodedIndex]] result PARTITIONED BY
   * the coarse cell (`list`): a probe-limited search then reads ONLY
   * the probed cells' directories — Catalyst turns the `list IN (...)`
   * prefilter into a partition filter, so an nprobe-of-nlist probe
   * reads ~nprobe/nlist of the index bytes. That is the on-disk
   * analogue of IVF's candidate cut, and the difference between a
   * billion-vector index being a full scan per query batch or a few
   * directories. Unlike the dedup indexes (bucketed by a JOIN key —
   * the classify is an equi-join), the IVF probe is a SCAN-and-score,
   * so directory pruning, not bucketing, is the right physical layout.
   */
  def saveCoded(coded: DataFrame, tableName: String, path: String,
      nlist: Int, m: Int, tasksPerCell: Int = 1): Unit = {
    require(tasksPerCell >= 1, s"tasksPerCell must be >= 1, got $tasksPerCell")
    val spark = coded.sparkSession
    // Repartition onto the cell key before the partitioned write — the
    // writeBucketed lesson applied to cells: without it, every write
    // task emits a file into every cell it happens to hold, so an
    // N-task bulk build writes up to N × nlist files (the object-store
    // small-files failure mode, and a slow commit). On the cell key
    // alone each cell lands in exactly ONE task → one file per cell;
    // for extreme bulk builds where a single cell is too big for one
    // task, tasksPerCell > 1 salts the shuffle with a content hash,
    // bounding files-per-cell at tasksPerCell while restoring write
    // parallelism.
    val out =
      if (tasksPerCell == 1) coded.repartition(col("list"))
      else coded.repartition(col("list"),
        pmod(xxhash64(coded.columns.filterNot(_ == "list").map(col)
          .toIndexedSeq: _*), lit(tasksPerCell)))
    out.write.partitionBy("list")
      .option("path", path).mode("overwrite").format("parquet")
      .saveAsTable(tableName)
    val props = ivfProps(nlist, m)
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES ($props)")
  }

  /**
   * O(batch) append into the cell-partitioned coded index — the write
   * half of a STREAMING vector index: each batch's vectors are
   * IVF-assigned + PQ-encoded upstream
   * ([[ProductQuant.buildCodedIndex]] with the index's own centroids/
   * model) and inserted into their cells' directories. Parameters are
   * checked against the stamped (nlist, m) first — appending rows
   * encoded under a different codebook would silently corrupt every
   * ADC distance in the touched cells. Appends add roughly one file
   * per task per touched cell per batch; run [[compactCoded]] on a
   * cadence (the [[maintain]] discipline, per-cell instead of
   * per-bucket).
   */
  def appendCoded(coded: DataFrame, tableName: String,
      nlist: Int, m: Int): Unit = {
    val spark = coded.sparkSession
    requireStamped(spark, tableName, ivfProps(nlist, m))
    coded.select(spark.table(tableName).columns.map(col).toIndexedSeq: _*)
      .write.mode("append").insertInto(tableName)
  }

  /**
   * Delete leftover `.spark-staging-*` directories under the coded
   * table's location — the residue of a dynamic-partition-overwrite
   * ([[retractCoded]]/[[compactCoded]]) killed mid-write. Committed
   * data is never under a staging dir, so this is pure garbage
   * collection — but ONLY safe when no write is in flight, which the
   * single-writer discipline guarantees at the top of a sink batch
   * ([[graft.streaming.StreamingIncremental.sinkCoded]] runs it there,
   * the coded analogue of `recover`). Returns directories deleted.
   */
  def cleanStagingDirs(spark: SparkSession, tableName: String): Int = {
    val root = new org.apache.hadoop.fs.Path(tablePath(spark, tableName))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return 0
    val stale = fs.listStatus(root).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith(".spark-staging"))
    stale.foreach(s => fs.delete(s.getPath, true))
    stale.length
  }

  /** Parquet data files per cell directory — [[compactCoded]]'s probe
    * and the growth monitor for streaming appends. */
  def cellFileCounts(spark: SparkSession, tableName: String): Map[Int, Int] = {
    val root = new org.apache.hadoop.fs.Path(tablePath(spark, tableName))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("list=")).map { d =>
      d.getPath.getName.stripPrefix("list=").toInt ->
        fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }.toMap
  }

  /**
   * Compact the cells whose file count exceeds `maxFilesPerCell` back
   * to ~one file each — the per-cell sibling of [[maintain]] for the
   * partitioned coded index. Uses [[retractCoded]]'s machinery in
   * reverse: the source is partition-pruned to the overgrown cells,
   * repartitioned onto the cell key (≈ one task per cell ⇒ one file
   * per cell), and swapped in with a dynamic-partition-overwrite
   * insert — cells under the threshold are untouched, and a crash
   * mid-write leaves the original files in place (per-partition
   * commit). Returns the number of cells compacted.
   */
  def compactCoded(spark: SparkSession, tableName: String,
      nlist: Int, m: Int, maxFilesPerCell: Int = 16): Int = {
    require(maxFilesPerCell >= 1,
      s"maxFilesPerCell must be >= 1, got $maxFilesPerCell")
    requireStamped(spark, tableName, ivfProps(nlist, m))
    val over = cellFileCounts(spark, tableName)
      .collect { case (cell, files) if files > maxFilesPerCell => cell }
      .toSeq.sorted
    if (over.isEmpty) return 0
    val table = spark.table(tableName)
    val rewritten = table
      .filter(col("list").isin(over.map(Int.box): _*))
      .select(table.columns.map(col).toIndexedSeq: _*)
      .repartition(over.length, col("list"))
      .localCheckpoint(true)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try rewritten.write.mode("overwrite").insertInto(tableName)
    finally prevMode.fold(spark.conf.unset(modeKey))(spark.conf.set(modeKey, _))
    over.length
  }

  /** The cell-partitioned coded index, parameter-checked against the
    * stamped (nlist, m), ready for [[ProductQuant.ivfAdcTopKPruned]].
    * Pass `repair = true` after partition directories were written by
    * an external process or restored from a snapshot — it runs
    * `recoverPartitions` (MSCK REPAIR) so those cells register; without
    * it an unregistered cell is silently invisible to the pruned scan
    * (wrong, incomplete top-k — not an error). [[saveCoded]]'s own
    * writes always register, so the default skips the listing cost. */
  def codedIndex(spark: SparkSession, tableName: String,
      nlist: Int, m: Int, repair: Boolean = false): DataFrame = {
    if (repair) spark.catalog.recoverPartitions(tableName)
    requireStamped(spark, tableName, ivfProps(nlist, m))
    spark.table(tableName)
  }

  // ------------------------------------------------------------------
  // Maintenance: files-per-bucket probe + compact + name swap
  // ------------------------------------------------------------------

  /** Data files under the table's location — the files-per-bucket
    * probe. Bucketed appends add one file per bucket per batch, so
    * files/buckets ~ appends since the last compaction. */
  def dataFileCount(spark: SparkSession, tableName: String): Int = {
    val loc = new org.apache.hadoop.fs.Path(tablePath(spark, tableName))
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(loc)) 0
    else {
      val it = fs.listFiles(loc, true)
      var n = 0
      while (it.hasNext) {
        val name = it.next().getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  /** One-call index maintenance: probe files-per-bucket, and when it
    * exceeds `maxFilesPerBucket`, compact (one file per bucket) into a
    * fresh path and SWAP the table name back — the step
    * [[compactExact]]/[[compactMinhash]] leave to the caller. Dispatches
    * exact vs minhash on the table's bucket keys; minhash sketch
    * properties are carried through the swap. Returns true iff a
    * compaction ran. After the swap the OLD files are deleted — callers
    * holding a pre-swap DataFrame for the table must re-resolve it
    * (`spark.table`), the usual catalog-table contract.
    *
    * The swap is metadata-atomic per step (DROP then RENAME are each
    * single catalog ops) but not jointly atomic — a concurrent reader
    * between the two sees a missing table, the standard
    * non-transactional-catalog caveat; run maintenance from the single
    * writer that also owns appends (the batch/foreachBatch loop).
    *
    * CRASH RECOVERY: a crash between DROP and RENAME leaves the data
    * alive only under the `<table>_compacting` name. On entry,
    * maintain runs [[recover]] — that state (tmp exists, table
    * doesn't) completes the interrupted RENAME, and a swap marker
    * stamped on the tmp table before the DROP records the pre-swap
    * data directory so recovery (or a retry after a crash between
    * RENAME and the delete) also removes the prior attempt's files; a
    * stale tmp alongside a live table (crash before the DROP) is
    * dropped AND its now-orphaned external files are deleted. The one
    * window this does not cover is a crash DURING the compact write
    * itself — the partial `-compact-<nano>` directory is not yet
    * referenced by any catalog entry; SCALE.md's runbook carries the
    * GC rule (delete any `-compact-*` sibling no table points at).
    *
    * REBUCKETING: `rebucketTo` rewrites the swap with a DIFFERENT
    * bucket count — the escape hatch for an index that outgrew the
    * count chosen at creation (rows per bucket no longer fit a task).
    * A rebucket is forced even below the file threshold (the point is
    * the layout, not the files). Classify plans against the rebucketed
    * table stay exchange-free on the index side; re-align
    * `spark.sql.shuffle.partitions` with the new count to keep the
    * batch side co-partitioned too. */
  def maintain(spark: SparkSession, tableName: String,
      maxFilesPerBucket: Int = 16, toPath: Option[String] = None,
      rebucketTo: Option[Int] = None): Boolean = {
    require(maxFilesPerBucket > 0,
      s"maxFilesPerBucket must be positive, got $maxFilesPerBucket")
    rebucketTo.foreach(b => require(b > 0, s"rebucketTo must be positive, got $b"))
    val tmp = tableName + "_compacting"
    // crashed between DROP and RENAME: the compacted data is complete —
    // finish the swap. Do NOT return yet: the recovered table carries
    // the PRIOR attempt's bucket count, so a rebucketTo in THIS call
    // still needs its own rewrite below (returning early would report a
    // rebucket that never happened)
    val recovered = recover(spark, tableName)
    if (spark.catalog.tableExists(tmp)) {
      // crashed before the DROP: the live table is authoritative;
      // discard the stale attempt, files included
      val stale = new org.apache.hadoop.fs.Path(tablePath(spark, tmp))
      spark.sql(s"DROP TABLE $tmp")
      stale.getFileSystem(spark.sessionState.newHadoopConf()).delete(stale, true)
    }
    val (buckets, keys) = bucketSpecOf(spark, tableName)
    val files = dataFileCount(spark, tableName)
    val rebucket = rebucketTo.exists(_ != buckets)
    if (!rebucket && files <= maxFilesPerBucket.toLong * buckets) return recovered
    val newBuckets = rebucketTo.getOrElse(buckets)
    swapRewrite(spark, tableName, toPath) { newPath =>
      if (keys == Seq("content_hash"))
        compactExact(spark, tableName, tmp, newPath, newBuckets)
      else
        compactMinhash(spark, tableName, tmp, newPath, newBuckets)
    }
    true
  }

  /** The marker stamped on the compacting table just before the swap's
    * DROP — it names the pre-swap data directory, so [[recover]] can
    * finish the delete after a crash anywhere between DROP and the
    * post-RENAME cleanup. Cleared once the old files are gone. */
  private val CompactedFromKey = "graft.compactedFrom"

  /** Rewrite-and-swap: `write` produces the replacement table under the
    * `<table>_compacting` name at a fresh (or caller-chosen) path; the
    * swap then renames it in under `tableName` and deletes the old
    * files, with the [[CompactedFromKey]] marker making every
    * post-write crash window recoverable by [[recover]]. */
  private def swapRewrite(spark: SparkSession, tableName: String,
      toPath: Option[String])(write: String => Unit): Unit = {
    val tmp = tableName + "_compacting"
    val oldPath = tablePath(spark, tableName)
    // strip any previous "-compact-<n>" suffix before stamping a new
    // one: a long-running maintenance loop (the streaming sinks) would
    // otherwise COMPOUND suffixes each round until the path component
    // passes the filesystem's 255-byte name limit and the compact
    // write dies mid-swap
    val newPath = toPath.getOrElse(
      oldPath.stripSuffix("/").replaceAll("-compact-\\d+$", "") +
        s"-compact-${System.nanoTime()}")
    val oldP = new org.apache.hadoop.fs.Path(oldPath)
    val fs = oldP.getFileSystem(spark.sessionState.newHadoopConf())
    // reject equal AND nested locations, both directions: a toPath
    // UNDER the table's location would be deleted with the old files
    // after the swap; the table's location under toPath would be
    // destroyed by the overwrite-mode write while still being read
    val oldQ = fs.makeQualified(oldP).toString.stripSuffix("/")
    val newQ = fs.makeQualified(
      new org.apache.hadoop.fs.Path(newPath)).toString.stripSuffix("/")
    require(oldQ != newQ && !newQ.startsWith(oldQ + "/") &&
        !oldQ.startsWith(newQ + "/"),
      s"toPath ($newQ) must not equal or nest with the table's current " +
        s"location ($oldQ): one side's files would be deleted with the other's")
    write(newPath)
    spark.sql(
      s"ALTER TABLE $tmp SET TBLPROPERTIES ('$CompactedFromKey'='$oldQ')")
    spark.sql(s"DROP TABLE $tableName")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $tableName")
    fs.delete(oldP, true)
    spark.sql(
      s"ALTER TABLE $tableName UNSET TBLPROPERTIES IF EXISTS ('$CompactedFromKey')")
  }

  /** Complete a [[maintain]]/[[retract]] swap interrupted by a crash —
    * safe to call any time from the single writer (the streaming sinks
    * run it at the top of every micro-batch so a restarted stream
    * self-heals instead of wedging on table-not-found):
    *
    *  - tmp exists, table missing (crash between DROP and RENAME): the
    *    rewritten data is complete — finish the RENAME.
    *  - the live table still carries the [[CompactedFromKey]] marker
    *    (crash between RENAME and the old-files delete, including a
    *    swap just completed by the branch above): delete the pre-swap
    *    directory it names and clear the marker.
    *
    * Returns true iff a half-finished swap's RENAME was completed. A
    * stale tmp ALONGSIDE a live table is deliberately left for
    * [[maintain]]: deleting it here would race an in-flight compaction
    * if a reader ever called recover concurrently. */
  def recover(spark: SparkSession, tableName: String): Boolean = {
    val tmp = tableName + "_compacting"
    val completed =
      if (spark.catalog.tableExists(tmp) && !spark.catalog.tableExists(tableName)) {
        spark.sql(s"ALTER TABLE $tmp RENAME TO $tableName")
        true
      } else false
    if (spark.catalog.tableExists(tableName)) {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      meta.properties.get(CompactedFromKey).foreach { old =>
        val oldP = new org.apache.hadoop.fs.Path(old)
        val fs = oldP.getFileSystem(spark.sessionState.newHadoopConf())
        val oldQ = fs.makeQualified(oldP).toString.stripSuffix("/")
        val cur = fs.makeQualified(new org.apache.hadoop.fs.Path(
          meta.location)).toString.stripSuffix("/")
        // belt-and-braces: the swap's nesting guard means the marker can
        // never name the live location, but never delete it if it does
        if (oldQ != cur && !cur.startsWith(oldQ + "/") &&
            !oldQ.startsWith(cur + "/"))
          fs.delete(oldP, true)
        spark.sql(s"ALTER TABLE $tableName UNSET TBLPROPERTIES " +
          s"IF EXISTS ('$CompactedFromKey')")
      }
    }
    completed
  }

  /**
   * RETRACTION — the delete path the append-only indexes otherwise
   * lack (a takedown/opt-out request for a keeper document): remove
   * every index row whose keeper id is in `ids` and swap the rewritten
   * table in under the same name. Dispatches exact vs minhash on the
   * table's bucket keys; minhash sketch properties are carried through.
   * Returns the number of index rows removed (0 = no rewrite ran).
   *
   * AFTER RETRACTION the content is re-acceptable: a re-submission
   * finds no index row for its hash/bands, classifies `new`, and a
   * fresh keeper id takes over — retraction is forgetting, not
   * blocklisting (compose with [[Blocklist]] when re-acceptance must
   * also be refused). `resolveKeepers` over post-retraction classify
   * output can never emit a retracted id, because no index row carries
   * one.
   *
   * COST: O(index) worst case — one bucketed scan minus a BROADCAST
   * anti-join (takedown sets are human-scale; the membership probe is
   * a semi-join count first, so an ids set that touches nothing costs
   * one scan and no rewrite). At production scale, batch retractions
   * and fold them into the compaction cadence: a retraction IS a
   * forced compaction (same swap machinery, crash recovery, and
   * suffix re-stamping as [[maintain]]), so running it at the moment
   * maintain would rewrite anyway makes the delete amortized-free.
   */
  def retract(spark: SparkSession, tableName: String, ids: DataFrame,
      idCol: String = "keep_id", toPath: Option[String] = None): Long = {
    recover(spark, tableName)
    val (buckets, keys) = bucketSpecOf(spark, tableName)
    val retracted = broadcast(
      ids.select(col(idCol).cast("long").as("_retract_id")).distinct())
    val removed = spark.table(tableName)
      .join(retracted, col("keep_id") === col("_retract_id"), "left_semi")
      .count()
    if (removed == 0L) return 0L
    // the remaining rows re-bucket on the SAME keys/count, so classify
    // plans against the retracted table stay exchange-free
    val remaining = spark.table(tableName)
      .join(retracted, col("keep_id") === col("_retract_id"), "left_anti")
    val sketchProps =
      if (keys == Seq("content_hash")) None
      else Some(spark.sql(s"SHOW TBLPROPERTIES $tableName").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap)
    val tmp = tableName + "_compacting"
    swapRewrite(spark, tableName, toPath) { newPath =>
      writeBucketed(remaining, tmp, newPath, buckets, keys, "overwrite")
      sketchProps.foreach { props =>
        val carried = minhashProps(
          props.getOrElse("graft.shingleN", "3").toInt,
          props.getOrElse("graft.numHashes", "9").toInt,
          props.getOrElse("graft.bands", "3").toInt)
          .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
        spark.sql(s"ALTER TABLE $tmp SET TBLPROPERTIES ($carried)")
      }
    }
    removed
  }

  /**
   * RETRACTION for the cell-partitioned IVF-PQ index — [[retract]]'s
   * sibling for [[saveCoded]] tables (a takedown that removes a
   * document's content hash but leaves its VECTOR searchable is only
   * half a takedown). Removes every coded row whose id is in `ids`
   * and returns the number of rows removed (0 = nothing written).
   *
   * SCALE SHAPE — this is where the cell layout pays again: the only
   * full pass is a two-column (id, list) probe scan that finds the
   * AFFECTED CELLS (driver-sized: at most nlist rows come back).
   * The rewrite then reads and rewrites ONLY those cells' directories
   * — a dynamic-partition-overwrite insert whose source is
   * partition-pruned to the affected `list` values — so a takedown
   * touching 3 of 4096 cells rewrites 3 directories, not the index.
   * Centroids and codebooks are data-independent parameters and are
   * untouched; a probe of an emptied cell simply scores zero rows.
   *
   * A cell whose every row is retracted is dropped from the catalog
   * and its directory deleted (dynamic overwrite alone cannot express
   * "this partition is now empty" — it only overwrites partitions the
   * source still has rows for).
   *
   * CRASH SAFETY: the insert commits per-partition through Spark's
   * staging protocol, so original cell data survives a mid-write
   * crash; a crash AFTER the insert but before the empty-cell drop
   * leaves fully-retracted cells' rows in place — re-running the same
   * retraction converges (those rows still match `ids`, the re-run
   * rewrites/drops them; a retraction is idempotent by construction).
   *
   * Like [[retract]], this FORGETS: re-submitting a retracted vector
   * id re-indexes it. Compose with [[Blocklist]] upstream when
   * re-acceptance must also be refused.
   */
  def retractCoded(spark: SparkSession, tableName: String, ids: DataFrame,
      idCol: String, nlist: Int, m: Int): Long = {
    requireStamped(spark, tableName, ivfProps(nlist, m))
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    require(meta.partitionColumnNames == Seq("list"),
      s"$tableName is not a saveCoded cell-partitioned index " +
        s"(partitions: ${meta.partitionColumnNames.mkString(",")})")
    val table = spark.table(tableName)
    val idType = table.schema(table.schema.fieldIndex(idCol)).dataType
    val retracted = broadcast(
      ids.select(col(idCol).cast(idType).as("_retract_id")).distinct())
    // one (id, list) probe pass: affected cells + removed count together
    val affected = table
      .join(retracted, table(idCol) === col("_retract_id"), "left_semi")
      .groupBy("list").agg(count(lit(1)).as("_n")).collect()
    if (affected.isEmpty) return 0L
    val removed = affected.map(_.getLong(1)).sum
    val cells = affected.map(_.getInt(0)).toSeq
    // survivors of the affected cells only — localCheckpoint breaks the
    // lineage back to the table so the insert is not a read-from-
    // overwritten-path plan (the StreamingIncremental append
    // discipline); sized O(affected cells), spills via block manager
    val remaining = table
      .filter(col("list").isin(cells.map(Int.box): _*))
      .join(retracted, table(idCol) === col("_retract_id"), "left_anti")
      .select(table.columns.map(col).toIndexedSeq: _*) // insertInto is positional
      .localCheckpoint(true)
    // dynamic mode via SESSION conf: the per-write option is honored on
    // the path-based save() route but NOT on the catalog insertInto
    // route, where static mode would silently clobber every unaffected
    // cell (observed: a 2-cell retraction left a 1-cell table)
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try remaining.write.mode("overwrite").insertInto(tableName)
    finally prevMode.fold(spark.conf.unset(modeKey))(spark.conf.set(modeKey, _))
    // cells with no survivors never appear in `remaining`, so the
    // dynamic overwrite left their rows untouched: drop + delete them
    val survivors =
      remaining.select("list").distinct().collect().map(_.getInt(0)).toSet
    val emptied = cells.filterNot(survivors)
    if (emptied.nonEmpty) {
      spark.sql(s"ALTER TABLE $tableName DROP IF EXISTS " +
        emptied.map(c => s"PARTITION (list=$c)").mkString(", "))
      val root = new org.apache.hadoop.fs.Path(tablePath(spark, tableName))
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      emptied.foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"list=$c"), true)
      }
    }
    removed
  }

  // ------------------------------------------------------------------

  private def bucketSpecOf(spark: SparkSession, tableName: String): (Int, Seq[String]) = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val spec = cat.getTableMetadata(ident).bucketSpec.getOrElse(
      sys.error(s"$tableName has no bucket spec — was it written by IndexStore?"))
    (spec.numBuckets, spec.bucketColumnNames)
  }

  private def tablePath(spark: SparkSession, tableName: String): String = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    spark.sessionState.catalog.getTableMetadata(ident).location.toString
  }
}
