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
}
