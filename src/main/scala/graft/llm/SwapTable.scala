package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Create-or-swap maintenance for a SMALL catalog-backed state table
 * (strata×k samples, per-shard cursors — model-sized, never
 * corpus-sized): the [[IndexStore]] swap discipline packaged for
 * maintainers outside the store.
 *
 * An upsert never overwrites the table in place. The first call
 * creates the table at `path` and stamps it; every later call writes
 * the new contents to a FRESH versioned sibling (`path-v<n>`,
 * probe-and-retry — never trust a generated path not to exist),
 * RETIRES the superseded location with the caller's `graceMs` stamped
 * on the entry ([[IndexStore.retireLocations]]), and swaps with ONE
 * atomic `ALTER TABLE ... SET LOCATION`. A crash before the ALTER
 * leaves the table on its old complete data (the retired entry then
 * names a still-live location, which [[IndexStore.vacuum]]'s guard
 * drops without deleting); the table itself is never dropped, so
 * creation-time stamps survive every swap and a stamp-less or drifted
 * table is always refusable as foreign.
 *
 * Reclamation is [[IndexStore.vacuum]] at upsert ENTRY, honoring each
 * entry's own stamped grace: with `graceMs = 0` a superseded
 * generation survives exactly until the next upsert (the
 * one-generation window); with `graceMs > 0` it survives AT LEAST
 * that long regardless of upsert frequency — set it above the longest
 * concurrent read and a reader whose file listing spans any number of
 * swaps still finishes. Single-writer by contract, like every swap
 * maintainer in the engine.
 */
object SwapTable {

  /** Write `out` as the table's new contents (create on first use).
    * `out` MAY read the very table being swapped: the new contents are
    * fully written to a FRESH versioned sibling BEFORE the retire +
    * ALTER touch the catalog, and the superseded location survives on
    * disk until a LATER upsert's vacuum reclaims it — so the read
    * always sees the complete current generation and no caller-side
    * checkpoint is needed for the swap itself. (A caller that keeps
    * reading `out` across MULTIPLE later upserts of the same table
    * must still materialize, since the generation it captured is
    * reclaimed after the grace window.) `stamps` are set once at
    * creation and never touched again. Returns true if this call
    * CREATED the table. */
  def upsert(out: DataFrame, tableName: String, path: String,
      stamps: Seq[(String, String)] = Nil, graceMs: Long = 0L): Boolean = {
    val spark = out.sparkSession
    if (!spark.catalog.tableExists(tableName)) {
      out.write.option("path", path).mode("overwrite").format("parquet")
        .saveAsTable(tableName)
      if (stamps.nonEmpty) {
        stamps.foreach { case (k, v) =>
          // the stamp rides inside a SQL string literal — a quote would
          // terminate it (internal knobs, so refusal beats escaping)
          require(!k.contains("'") && !v.contains("'"),
            s"stamp $k='$v' contains a quote — unstampable")
        }
        val kv = stamps.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
        spark.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES ($kv)")
      }
      true
    } else {
      // reclaim generations whose stamped grace has elapsed
      IndexStore.vacuum(spark, tableName)
      val hadoopConf = spark.sessionState.newHadoopConf()
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(hadoopConf)
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val current = fs.makeQualified(new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(ident).location)).toString
      val newPath = Iterator.iterate(System.currentTimeMillis())(_ + 1)
        .map(v => s"$path-v$v")
        .find(p => !fs.exists(new org.apache.hadoop.fs.Path(p)))
        .get
      out.write.mode("overwrite").parquet(newPath)
      val newQ = fs.makeQualified(new org.apache.hadoop.fs.Path(newPath)).toString
      require(!newQ.contains("'"),
        s"generated location contains a quote — cannot SET LOCATION: $newQ")
      // retire BEFORE the ALTER stops referencing the old location: a
      // crash in between leaves an entry naming live data, which
      // vacuum's live-location guard drops instead of deleting
      IndexStore.retireLocations(spark, tableName, Seq(current), graceMs)
      spark.sql(s"ALTER TABLE $tableName SET LOCATION '$newQ'")
      spark.catalog.refreshTable(tableName)
      false
    }
  }

  /** Fail-fast stamp check: every (key, expected) must be stamped on
    * the table with exactly the expected value. `what` names the
    * refusing operator in the error. */
  def requireStamps(spark: SparkSession, tableName: String,
      expected: Seq[(String, String)], what: String): Unit = {
    // catalog API, not SHOW TBLPROPERTIES: SHOW redacts any value whose
    // key matches Spark's secret-key regex (which includes "token" —
    // a stamp named targetTokens would compare against "(redacted)")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val props = spark.sessionState.catalog.getTableMetadata(ident).properties
    expected.foreach { case (k, v) =>
      val got = props.getOrElse(k, sys.error(
        s"$tableName carries no $k stamp — not a $what table; " +
          "re-create through its maintainer"))
      require(got == v,
        s"$tableName was built with $k=$got, but this call uses $k=$v — " +
          "mixing state built on different knobs silently corrupts the " +
          "maintainer's laws; rebuild or pass the stamped knobs")
    }
  }
}
