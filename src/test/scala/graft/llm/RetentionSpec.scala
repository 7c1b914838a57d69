package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Retired-directory retention metadata — the machinery behind
 * snapshot-safe index rewrites ([[IndexStore.vacuum]]):
 *
 *  - entries are CHUNKED across numbered `graft.retired.N` properties
 *    so no single value exceeds a Hive-compatible metastore's ~4k
 *    property-value cap (a retraction touching many cells would
 *    otherwise overflow exactly when retention is most loaded);
 *  - each entry carries its OWN grace stamped at retire time, so a
 *    later maintenance call with a different (or default) grace never
 *    collapses the snapshot window an earlier rewrite promised;
 *  - the legacy unnumbered `graft.retired` key (no grace field) still
 *    reads, as grace 0, and is rewritten into chunked form;
 *  - a path containing the `;` separator is refused at retire time.
 */
class RetentionSpec extends AnyFunSuite {

  private def freshTable(name: String): String = {
    val spark = TestSpark.spark
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ret")
      .resolve(name).toString
    IndexStore.saveExact(
      Seq((1L, "a"), (2L, "b")).toDF("keep_id", "content_hash"),
      name, path, buckets = 2)
    name
  }

  private def props(tbl: String): Map[String, String] = {
    val spark = TestSpark.spark
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tbl)
    spark.sessionState.catalog.getTableMetadata(ident).properties
  }

  private def mkDirs(n: Int): Seq[String] =
    (0 until n).map { i =>
      java.nio.file.Files.createTempDirectory(f"graft_ret_dir$i%03d").toString
    }

  test("many retired entries chunk across numbered properties, each under the cap, and round-trip") {
    val spark = TestSpark.spark
    val tbl = freshTable("graft_ret_chunk")
    try {
      val dirs = mkDirs(60) // ~100 chars serialized each → several chunks
      IndexStore.retire(spark, tbl, dirs, graceMs = 60000L)
      val retProps = props(tbl).filter(_._1.startsWith("graft.retired"))
      assert(retProps.size > 1, s"60 entries must not fit one chunk (got ${retProps.size})")
      assert(retProps.keys.forall(_.matches("graft\\.retired\\.\\d+")))
      assert(retProps.values.forall(_.length <= IndexStore.RetiredChunkLen),
        "every chunk must respect the metastore-safe cap")
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tbl)
      val entries = IndexStore.retiredEntries(
        spark.sessionState.catalog.getTableMetadata(ident))
      assert(entries.size == 60, "all entries must round-trip through chunking")
      assert(entries.forall(_._2 == 60000L), "stamped grace must round-trip")
      assert(entries.map(_._3).toSet ==
        dirs.map(d => "file:" + d).toSet)
      // explicit operator override reclaims everything now
      assert(IndexStore.vacuum(spark, tbl, graceMs = 0L) == 60)
      assert(props(tbl).keys.forall(!_.startsWith("graft.retired")),
        "a drained retired list must remove every chunk property")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("per-entry grace is self-describing: a default vacuum honors each entry's own stamp") {
    val spark = TestSpark.spark
    val tbl = freshTable("graft_ret_grace")
    try {
      val Seq(longLived, shortLived) = mkDirs(2)
      IndexStore.retire(spark, tbl, Seq(longLived), graceMs = 10 * 60 * 1000L)
      IndexStore.retire(spark, tbl, Seq(shortLived), graceMs = 0L)
      // the cadence vacuum (no override) — the call every rewrite makes
      // at entry/exit — must reclaim ONLY the grace-elapsed entry
      assert(IndexStore.vacuum(spark, tbl) == 1,
        "default vacuum must reclaim only the grace-0 entry")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(longLived)),
        "an entry inside its stamped grace must survive a default vacuum")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(shortLived)))
      // explicit override: forced reclamation ignores the stamp
      assert(IndexStore.vacuum(spark, tbl, graceMs = 0L) == 1)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(longLived)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("legacy unnumbered graft.retired entries read as grace 0 and rewrite into chunked form") {
    val spark = TestSpark.spark
    val tbl = freshTable("graft_ret_legacy")
    try {
      val Seq(oldLegacy, freshLegacy) = mkDirs(2)
      val oldQ = "file:" + oldLegacy
      val freshQ = "file:" + freshLegacy
      val now = System.currentTimeMillis()
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
        s"('graft.retired'='123:$oldQ;$now:$freshQ')")
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tbl)
      val entries = IndexStore.retiredEntries(
        spark.sessionState.catalog.getTableMetadata(ident))
      // legacy entries carry the conservative migration grace, never 0:
      // the first post-upgrade cadence vacuum must not collapse a
      // window pre-upgrade code promised its readers
      assert(entries == Seq((123L, IndexStore.LegacyGraceMs, oldQ),
        (now, IndexStore.LegacyGraceMs, freshQ)))
      // the next retire folds the legacy entries into the chunked keys
      val Seq(newDir) = mkDirs(1)
      IndexStore.retire(spark, tbl, Seq(newDir), graceMs = 5000L)
      val ps = props(tbl)
      assert(!ps.contains("graft.retired"),
        "the legacy key must be rewritten away")
      assert(ps.contains("graft.retired.0"))
      // the ancient legacy entry's hour has long elapsed → reclaimed;
      // the JUST-retired legacy entry is inside its migration grace and
      // MUST survive the post-upgrade cadence vacuum (the upgrade law)
      assert(IndexStore.vacuum(spark, tbl) == 1)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(freshLegacy)),
        "a recent legacy entry must survive the first post-upgrade vacuum")
      assert(IndexStore.vacuum(spark, tbl, graceMs = 0L) == 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("a path containing the ';' separator is refused at retire time") {
    val spark = TestSpark.spark
    val tbl = freshTable("graft_ret_semi")
    try {
      val bad = java.nio.file.Files.createTempDirectory("graft_ret")
        .resolve("a;b").toString
      val e = intercept[IllegalArgumentException] {
        IndexStore.retire(spark, tbl, Seq(bad), graceMs = 0L)
      }
      assert(e.getMessage.contains(";"))
      assert(props(tbl).keys.forall(!_.startsWith("graft.retired")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
