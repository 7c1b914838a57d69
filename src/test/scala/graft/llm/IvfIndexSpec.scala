package graft.llm

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The persisted IVF-PQ index contracts (IndexStore.saveCoded +
 * ProductQuant.ivfAdcTopKPruned):
 *
 *  - PRUNING: a probed search over the cell-partitioned table reads
 *    ONLY the probed cells' directories — the scan's partition-read
 *    count equals the probed-cell count, not nlist. At billion-vector
 *    scale this is the difference between a per-batch full index scan
 *    and a few directories.
 *  - EXACTNESS: pruning changes bytes read, never results — the pruned
 *    search equals the unpruned search over the same table, row for
 *    row, and full probing equals the whole-corpus ADC scan.
 *  - DRIFT: a (nlist, m) mismatch against the stamped table properties
 *    fails fast before any job runs.
 */
class IvfIndexSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val model =
    ProductQuant.train(e, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
  private lazy val centroids =
    Clustering.train(e, "vec_id", "embedding", k = 8, iters = 3).centroids

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSeq.sortBy(_.mkString("|"))

  test("saveCoded: pruned probe reads exactly the probed partitions and matches the unpruned search; drift fails fast") {
    // AQE off so the executed plan is the plain traversable tree (the
    // IndexStoreSpec discipline); pruning itself is a static partition
    // filter and identical either way
    val spark = TestSpark.spark.newSession()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val coded = ProductQuant.buildCodedIndex(e, "vec_id", "embedding",
      centroids, model, ordered = false)
    val tbl = "graft_ivf_coded"
    try {
      IndexStore.saveCoded(coded, tbl,
        java.nio.file.Files.createTempDirectory("graft_ivf").resolve(tbl).toString,
        nlist = centroids.length, m = model.m)
      val table = IndexStore.codedIndex(spark, tbl, centroids.length, model.m)
      val q = e.filter(col("vec_id") < 5)
      val nprobe = 2
      val cells = ProductQuant.ivfProbedCells(q, "vec_id", "embedding",
        centroids, nprobe)
      assert(cells.length < centroids.length,
        "fixture must probe a strict subset of cells for the pin to mean anything")
      val pruned = ProductQuant.ivfAdcTopKPruned(table, q, "vec_id", "embedding",
        centroids, model, k = 5, nprobe = nprobe, ordered = false)
      val prunedRows = sortedRows(pruned)
      // exactness: pruning never changes results
      assert(prunedRows == sortedRows(ProductQuant.ivfAdcTopK(table, q,
        "vec_id", "embedding", centroids, model, k = 5, nprobe = nprobe,
        ordered = false)))
      assert(prunedRows.nonEmpty)
      // pruning: the table scan read |probed cells| partitions, not nlist
      val scans = pruned.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec if f.relation.partitionSchema.exists(_.name == "list") => f
      }
      assert(scans.nonEmpty, "probe plan must scan the partitioned table")
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty,
        s"the list IN (...) prefilter must become a partition filter:\n$scan")
      assert(scan.metrics("numPartitions").value == cells.length,
        s"scan read ${scan.metrics("numPartitions").value} partitions, " +
          s"expected the ${cells.length} probed cells")
      // full probing over the TABLE equals the whole-corpus ADC scan
      assert(sortedRows(ProductQuant.ivfAdcTopKPruned(table, q, "vec_id",
        "embedding", centroids, model, k = 5, nprobe = centroids.length,
        ordered = false)) ==
        sortedRows(ProductQuant.adcTopK(e, q, "vec_id", "embedding", model,
          k = 5, ordered = false)))
      // parameter drift fails fast via the stamped properties
      val err = intercept[IllegalArgumentException] {
        IndexStore.codedIndex(spark, tbl, centroids.length * 2, model.m)
      }
      assert(err.getMessage.contains("nlist"))
      // repair law: a partition directory written OUTSIDE Spark (the
      // snapshot-restore scenario) is invisible until repair = true
      // runs recoverPartitions — without it the pruned scan silently
      // misses the cell's vectors
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(tbl))
          .location.toString))
      val srcDir = loc.listFiles().filter(_.getName.startsWith("list=")).head
      val extDir = new java.io.File(loc, "list=999")
      extDir.mkdirs()
      srcDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(extDir, f.getName).toPath)
      }
      val before = IndexStore.codedIndex(spark, tbl, centroids.length, model.m)
        .filter(col("list") === 999).count()
      assert(before == 0L, "unregistered external partition must be invisible")
      val after = IndexStore.codedIndex(spark, tbl, centroids.length, model.m,
        repair = true).filter(col("list") === 999).count()
      assert(after > 0L, "repair = true must register the external partition")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("saveCoded write layout: one file per cell by default; tasksPerCell bounds the fan-out for bulk builds") {
    val spark = TestSpark.spark.newSession()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .repartition(8) // a multi-task source — the layout must not leak it
    val coded = ProductQuant.buildCodedIndex(e, "vec_id", "embedding",
      centroids, model, ordered = false)
    def filesPerCell(tbl: String): Map[String, Int] =
      IndexStore.cellFileCounts(spark, tbl).map { case (k, v) => k.toString -> v }
    val tbl = "graft_ivf_layout"
    try {
      IndexStore.saveCoded(coded, tbl,
        java.nio.file.Files.createTempDirectory("graft_ivfl").resolve(tbl).toString,
        nlist = centroids.length, m = model.m)
      assert(filesPerCell(tbl).values.forall(_ == 1),
        s"default layout must be ONE file per cell, got ${filesPerCell(tbl)}")
      IndexStore.saveCoded(coded, tbl,
        java.nio.file.Files.createTempDirectory("graft_ivfl2").resolve(tbl).toString,
        nlist = centroids.length, m = model.m, tasksPerCell = 3)
      assert(filesPerCell(tbl).values.forall(c => c >= 1 && c <= 3),
        s"tasksPerCell = 3 must bound files per cell at 3, got ${filesPerCell(tbl)}")
      intercept[IllegalArgumentException] {
        IndexStore.saveCoded(coded, tbl, "/tmp/never", 1, 1, tasksPerCell = 0)
      }
      // staging GC: a crashed dynamic-overwrite's leftover staging dir
      // is deleted; committed cell data is untouched
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(tbl))
          .location.toString))
      val staging = new java.io.File(loc, ".spark-staging-deadbeef")
      staging.mkdirs()
      new java.io.File(staging, "orphan.parquet").createNewFile()
      val before = filesPerCell(tbl)
      assert(IndexStore.cleanStagingDirs(spark, tbl) == 1)
      assert(!staging.exists, "the stale staging dir must be deleted")
      assert(filesPerCell(tbl) == before, "committed cells must be untouched")
      assert(IndexStore.cleanStagingDirs(spark, tbl) == 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("retractCoded: removes exactly the ids, rewrites ONLY affected cells, drops emptied cells, search never returns a retracted id") {
    val spark = TestSpark.spark.newSession()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val coded = ProductQuant.buildCodedIndex(e, "vec_id", "embedding",
      centroids, model, ordered = false)
    val tbl = "graft_ivf_retract"
    try {
      IndexStore.saveCoded(coded, tbl,
        java.nio.file.Files.createTempDirectory("graft_ivfr").resolve(tbl).toString,
        nlist = centroids.length, m = model.m)
      val loc = new java.io.File(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(tbl))
          .location.toString))
      // cell → (current catalog location, its parquet files+mtimes):
      // a rewritten cell's files move to a fresh VERSIONED directory
      // (snapshot safety), so the byte-identity pin must follow the
      // partition's registered location, not root/list=<c>
      def cellFiles(): Map[String, (String, Set[(String, Long)])] =
        spark.sessionState.catalog.listPartitions(
          spark.sessionState.sqlParser.parseTableIdentifier(tbl)).map { p =>
          val d = new java.io.File(new java.net.URI(p.location.toString))
          s"list=${p.spec("list")}" -> (d.getPath ->
            d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.lastModified())).toSet)
        }.toMap
      val table0 = spark.table(tbl)
      // pick the retract set: all ids of ONE cell (it must empty and
      // drop) plus a couple of ids from another (it must rewrite)
      val byCell = table0.groupBy("list").agg(count(lit(1)).as("n"))
        .orderBy("list").collect().map(r => r.getInt(0) -> r.getLong(1))
      assert(byCell.length >= 3, "fixture needs >= 3 populated cells")
      val emptyCell = byCell.minBy(_._2)._1
      val rewriteCell = byCell.filter(_._1 != emptyCell).maxBy(_._2)._1
      val emptyIds = table0.filter(col("list") === emptyCell)
        .select("vec_id").collect().map(_.getLong(0))
      val someIds = table0.filter(col("list") === rewriteCell)
        .select("vec_id").limit(2).collect().map(_.getLong(0))
      val retractIds = (emptyIds ++ someIds).toSet
      // structural projection: the codes column is an Array (reference
      // equality) — compare (id, list, codes-as-List) sets instead
      def rows(df: DataFrame): Set[(Long, Int, Seq[Int])] =
        df.collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[Int]("list"),
          r.getSeq[Int](r.fieldIndex("codes")).toList: Seq[Int])).toSet
      val expected = rows(
        table0.filter(!col("vec_id").isin(retractIds.toSeq.map(Long.box): _*)))
      val filesBefore = cellFiles()

      // no-hit probe: nothing removed, nothing written
      import spark.implicits._
      assert(IndexStore.retractCoded(spark, tbl,
        Seq(-1L, -2L).toDF("vec_id"), "vec_id", centroids.length, model.m) == 0L)
      assert(cellFiles() == filesBefore, "a no-hit retraction must not write")

      val removed = IndexStore.retractCoded(spark, tbl,
        retractIds.toSeq.toDF("vec_id"), "vec_id", centroids.length, model.m)
      assert(removed == retractIds.size)
      // survivors are bit-identical to a filter of the original table
      assert(rows(spark.table(tbl)) == expected)
      // the emptied cell is gone from catalog AND disk (graceMs = 0
      // vacuums its retired directory immediately)
      val filesAfter = cellFiles()
      assert(!filesAfter.contains(s"list=$emptyCell"),
        "a fully-retracted cell must leave the catalog")
      assert(!new java.io.File(loc, s"list=$emptyCell").exists,
        "a fully-retracted cell's directory must be deleted at grace 0")
      assert(spark.table(tbl).filter(col("list") === emptyCell).count() == 0L)
      // PARTITION ISOLATION: every unaffected cell's location AND files
      // are untouched
      filesBefore.keys.filterNot(d =>
          d == s"list=$emptyCell" || d == s"list=$rewriteCell")
        .foreach { d =>
          assert(filesAfter(d) == filesBefore(d),
            s"unaffected cell $d must not be rewritten")
        }
      assert(filesAfter(s"list=$rewriteCell") != filesBefore(s"list=$rewriteCell"),
        "the affected cell must actually rewrite")
      // the rewritten cell swapped to a versioned directory and its
      // pre-rewrite directory was vacuumed at grace 0
      assert(filesAfter(s"list=$rewriteCell")._1 !=
        filesBefore(s"list=$rewriteCell")._1,
        "the affected cell must repoint to a fresh versioned directory")
      assert(!new java.io.File(filesBefore(s"list=$rewriteCell")._1).exists,
        "the pre-rewrite directory must be vacuumed at grace 0")
      // search law: pruned == unpruned over the retracted table, never
      // a retracted id, and full probing == ADC over the filtered corpus
      val q = e.filter(col("vec_id") < 5)
      val post = ProductQuant.ivfAdcTopKPruned(spark.table(tbl), q,
        "vec_id", "embedding", centroids, model, k = 5,
        nprobe = centroids.length, ordered = false)
      val postRows = post.collect()
      assert(postRows.nonEmpty)
      assert(!postRows.exists(r => retractIds.contains(r.getLong(2))),
        "search must never return a retracted id")
      assert(sortedRows(post) == sortedRows(ProductQuant.adcTopK(
        e.filter(!col("vec_id").isin(retractIds.toSeq.map(Long.box): _*)),
        q, "vec_id", "embedding", model, k = 5, ordered = false)))
      // idempotence: re-running the same retraction removes nothing
      assert(IndexStore.retractCoded(spark, tbl,
        retractIds.toSeq.toDF("vec_id"), "vec_id", centroids.length, model.m) == 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
