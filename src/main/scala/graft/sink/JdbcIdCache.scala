package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * JDBC-backed persistent ID cache with the reference's exact schema and
 * semantics (ref: wstlr/idcache.py:26-113): one table per target system
 * (name normalized by [[JdbcIdCache.fixTargetSystem]], idcache.py:24),
 * columns `(unique_id PRIMARY KEY, study_id, entity_type, fhir_endpoint,
 * target_id)` (idcache.py:50-57), a RAM cache primed once per target
 * system filtered by (study_id, fhir_endpoint) (idcache.py:44-75), and
 * [[storeId]] writing RAM + DB upsert only when the mapping actually
 * changed (idcache.py:91-113). The primary key is `unique_id` ALONE —
 * an upsert from one study replaces another study's row for the same
 * unique id, exactly as the reference's `INSERT OR REPLACE` does.
 *
 * Dialects: a `jdbc:sqlite:` URL gets the reference's literal DDL and
 * `INSERT OR REPLACE` — byte-compatible with the reference's on-disk
 * `.dbcache.sqlite3` when a SQLite JDBC driver is on the classpath; any
 * other URL gets portable ANSI DDL and an update-then-insert upsert with
 * identical semantics (exercised against embedded Derby, the JDBC
 * database shipped with Spark).
 *
 * The cache is metadata-scale (one row per loaded resource id), so
 * access is driver-side JDBC exactly like the reference's sqlite3 use;
 * [[loadAll]]/[[storeAll]] bridge to DataFrames for the distributed load
 * path ([[IdCacheStore]] remains the columnar cluster-scale sibling).
 * Because the reference's table name is a LOSSY transform of the target
 * system URL, the bridge keeps an additive `graft_systems` registry
 * table (normalized name -> original system string) so a full-cache
 * DataFrame can be reconstructed; the reference never reads it and its
 * own tables are untouched.
 */
final class JdbcIdCache(jdbcUrl: String, studyId: String, fhirEndpoint: String)
    extends AutoCloseable {
  import JdbcIdCache._

  private val conn = java.sql.DriverManager.getConnection(jdbcUrl)
  private val sqlite = jdbcUrl.startsWith("jdbc:sqlite:")
  private val ram = scala.collection.mutable.Map
    .empty[String, scala.collection.mutable.Map[String, (String, String)]]
  // tables confirmed present on THIS connection (lowercased) — spares a
  // full catalog scan per createTable/loadAll call. Absence is never
  // cached, so an external writer creating a table later is still seen.
  private val knownTables = scala.collection.mutable.Set.empty[String]

  /** True when `table` exists, via portable JDBC metadata — works on any
    * backend, unlike dialect-specific IF NOT EXISTS / SQLState checks. */
  private def tableExists(table: String): Boolean =
    knownTables.contains(table.toLowerCase) || {
      val meta = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      val found = try {
        var f = false
        while (meta.next() && !f)
          f = meta.getString("TABLE_NAME").equalsIgnoreCase(table)
        f
      } finally meta.close()
      if (found) knownTables += table.toLowerCase
      found
    }

  /** CREATE TABLE tolerant of pre-existing tables: a portable metadata
    * existence check first (SQLState vocabularies differ per backend),
    * with Derby's X0Y32 "already exists" swallowed as the race backstop. */
  private def createTable(table: String, ddl: String): Unit =
    if (!tableExists(table)) {
      try { val st = conn.createStatement(); try st.executeUpdate(ddl) finally st.close() }
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      knownTables += table.toLowerCase
    }

  private def ensureSystemTable(targetSystem: String): String = {
    val t = fixTargetSystem(targetSystem)
    // the normalized name is spliced into a quoted SQL identifier; the
    // reference transform doesn't sanitize quotes and most backends cap
    // identifier length (Derby: 128) — fail loudly instead of emitting
    // broken DDL
    require(!t.contains("\"") && (sqlite || t.length <= 128),
      s"target system '$targetSystem' normalizes to an unusable table name '$t'")
    if (sqlite)
      createTable(t,
        s"""CREATE TABLE IF NOT EXISTS "$t"
           |    (unique_id TEXT PRIMARY KEY,
           |    study_id TEXT NOT NULL,
           |    entity_type TEXT NOT NULL,
           |    fhir_endpoint TEXT NOT NULL,
           |    target_id TEXT NOT NULL)""".stripMargin)
    else
      createTable(t,
        s"""CREATE TABLE "$t"
           |    (unique_id VARCHAR(1024) NOT NULL PRIMARY KEY,
           |    study_id VARCHAR(256) NOT NULL,
           |    entity_type VARCHAR(256) NOT NULL,
           |    fhir_endpoint VARCHAR(1024) NOT NULL,
           |    target_id VARCHAR(1024) NOT NULL)""".stripMargin)
    registerSystem(t, targetSystem)
    t
  }

  private def registerSystem(table: String, original: String): Unit = {
    if (sqlite)
      createTable(SystemsTable, s"""CREATE TABLE IF NOT EXISTS "$SystemsTable" (table_name TEXT PRIMARY KEY, target_system TEXT NOT NULL)""")
    else
      createTable(SystemsTable, s"""CREATE TABLE "$SystemsTable" (table_name VARCHAR(256) NOT NULL PRIMARY KEY, target_system VARCHAR(1024) NOT NULL)""")
    val check = conn.prepareStatement(s"""SELECT target_system FROM "$SystemsTable" WHERE table_name = ?""")
    val existing = try {
      check.setString(1, table)
      val rs = check.executeQuery()
      try { if (rs.next()) Some(rs.getString(1)) else None } finally rs.close()
    } finally check.close()
    existing match {
      case Some(prev) if prev != original =>
        // the reference's lossy name transform CAN collide two distinct
        // systems onto one table (it then silently mixes their ids —
        // idcache.py:50). Mixing under a wrong label corrupts the
        // get-or-create join, so fail loudly instead.
        throw new IllegalStateException(
          s"target systems '$prev' and '$original' both normalize to table '$table' — " +
            "rename one identifier system or use separate cache databases")
      case Some(_) => ()
      case None =>
        val ins = conn.prepareStatement(s"""INSERT INTO "$SystemsTable" (table_name, target_system) VALUES (?, ?)""")
        try { ins.setString(1, table); ins.setString(2, original); ins.executeUpdate() } finally ins.close()
    }
  }

  /** Populate the RAM cache for `targetSystem` from the DB, creating the
    * table first if necessary (ref: idcache.py:44-75). Idempotent. */
  def primeCache(targetSystem: String): Unit = synchronized {
    if (!ram.contains(targetSystem)) {
      val t = ensureSystemTable(targetSystem)
      val m = scala.collection.mutable.Map.empty[String, (String, String)]
      val ps = conn.prepareStatement(
        s"""SELECT unique_id, entity_type, target_id FROM "$t"
           | WHERE study_id = ? AND fhir_endpoint = ?""".stripMargin)
      try {
        ps.setString(1, studyId); ps.setString(2, fhirEndpoint)
        val rs = ps.executeQuery()
        try while (rs.next()) m(rs.getString(1)) = (rs.getString(2), rs.getString(3))
        finally rs.close()
      } finally ps.close()
      ram(targetSystem) = m
    }
  }

  /** (entity_type, target_id) for a source unique key, or None
    * (ref: idcache.py:77-87). Synchronized like every other ram access:
    * an unlocked read racing a storeId mutation from another driver
    * thread (e.g. parallel load rounds) is a data race on mutable.Map. */
  def getId(targetSystem: String, entityKey: String): Option[(String, String)] =
    synchronized {
      primeCache(targetSystem)
      ram(targetSystem).get(entityKey)
    }

  /** Cache a (unique key -> server id) mapping; writes the DB upsert only
    * when the mapping changed, and skips the DB entirely when noDb
    * (ref: idcache.py:89-113). */
  def storeId(entityType: String, targetSystem: String, entityKey: String,
      targetId: String, noDb: Boolean = false): Unit = {
    primeCache(targetSystem)
    synchronized {
      if (!ram(targetSystem).get(entityKey).contains((entityType, targetId))) {
        ram(targetSystem)(entityKey) = (entityType, targetId)
        if (!noDb) upsert(fixTargetSystem(targetSystem), entityType, entityKey, targetId)
      }
    }
  }

  private def upsert(table: String, entityType: String, entityKey: String,
      targetId: String): Unit = {
    if (sqlite) {
      val ps = conn.prepareStatement(
        s"""INSERT OR REPLACE INTO "$table" (entity_type, unique_id, study_id, fhir_endpoint, target_id) VALUES (?, ?, ?, ?, ?)""")
      try {
        ps.setString(1, entityType); ps.setString(2, entityKey)
        ps.setString(3, studyId); ps.setString(4, fhirEndpoint)
        ps.setString(5, targetId)
        ps.executeUpdate()
      } finally ps.close()
    } else {
      val up = conn.prepareStatement(
        s"""UPDATE "$table" SET entity_type = ?, study_id = ?, fhir_endpoint = ?, target_id = ? WHERE unique_id = ?""")
      val n = try {
        up.setString(1, entityType); up.setString(2, studyId)
        up.setString(3, fhirEndpoint); up.setString(4, targetId)
        up.setString(5, entityKey)
        up.executeUpdate()
      } finally up.close()
      if (n == 0) {
        val ins = conn.prepareStatement(
          s"""INSERT INTO "$table" (entity_type, unique_id, study_id, fhir_endpoint, target_id) VALUES (?, ?, ?, ?, ?)""")
        try {
          ins.setString(1, entityType); ins.setString(2, entityKey)
          ins.setString(3, studyId); ins.setString(4, fhirEndpoint)
          ins.setString(5, targetId)
          ins.executeUpdate()
        } finally ins.close()
      }
    }
  }

  /** Every cached row for this (study, endpoint) across all registered
    * target systems, as an [[IdCacheStore.schema]] DataFrame —
    * (system, value, resource_type, fhir_id). Metadata-scale by the
    * reference's own design, so a driver-side read is the honest shape. */
  def loadAll(spark: SparkSession): DataFrame = synchronized {
    // same lock as getId/storeId: registeredSystems -> tableExists
    // touches the knownTables cache
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    registeredSystems().foreach { case (table, system) =>
      val ps = conn.prepareStatement(
        s"""SELECT unique_id, entity_type, target_id FROM "$table"
           | WHERE study_id = ? AND fhir_endpoint = ?""".stripMargin)
      try {
        ps.setString(1, studyId); ps.setString(2, fhirEndpoint)
        val rs = ps.executeQuery()
        try while (rs.next()) rows += Row(system, rs.getString(1), rs.getString(2), rs.getString(3))
        finally rs.close()
      } finally ps.close()
    }
    spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*), IdCacheStore.schema)
  }

  /** Upsert every row of an [[IdCacheStore.schema]] DataFrame —
    * (system, value, resource_type, fhir_id) — one resource id at a time
    * in driver memory (`toLocalIterator`), mirroring the reference's
    * per-id `store_id` writes during a load run. */
  def storeAll(cache: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val it = cache
      .select(IdCacheStore.schema.fieldNames.map(col).toIndexedSeq: _*)
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      storeId(r.getString(2), r.getString(0), r.getString(1), r.getString(3))
    }
  }

  private def registeredSystems(): Seq[(String, String)] = {
    if (!tableExists(SystemsTable)) return Nil
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"""SELECT table_name, target_system FROM "$SystemsTable"""")
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      try while (rs.next()) out += ((rs.getString(1), rs.getString(2)))
      finally rs.close()
      out.toSeq
    } finally st.close()
  }

  override def close(): Unit = conn.close()
}

object JdbcIdCache {

  /** The bridge's additive registry table (see class doc). */
  val SystemsTable = "graft_systems"

  /** Target-system URL -> table name (ref: idcache.py:23-24): everything
    * after the last "//", with /-. replaced by underscores. */
  def fixTargetSystem(ts: String): String =
    ts.split("//").last.replace("/", "_").replace("-", "_").replace(".", "_")

  /** An id-cache "path" addresses a JDBC store when it is a JDBC URL; a
    * bare `*.sqlite3` path is shorthand for the reference's on-disk
    * artifact via the SQLite driver (requires one on the classpath). */
  def isJdbcPath(path: String): Boolean =
    path.startsWith("jdbc:") || path.endsWith(".sqlite3")

  def normalizeUrl(path: String): String =
    if (path.startsWith("jdbc:")) path else s"jdbc:sqlite:$path"
}
