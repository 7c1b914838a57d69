package graft.llm

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Snapshot-safe index reads — the serving-while-maintaining contract:
 * a search running CONCURRENTLY with retract/maintain/compactCoded
 * never errors, because
 *
 *  - the bucketed swaps are one atomic `ALTER ... SET LOCATION` (a
 *    reader never sees the table missing — the DROP+RENAME window is
 *    gone from the non-rebucket path), and
 *  - pre-swap files are RETAINED for the maintenance call's `graceMs`
 *    ([[IndexStore.vacuum]]), so a reader whose file listing predates
 *    the swap finishes against retained files instead of dying on
 *    deleted ones.
 *
 * The reader threads here deliberately `refreshTable` every iteration
 * (the serving discipline): listings change mid-loop, maximizing the
 * chance of spanning a swap. Without retention these loops fail on
 * FileNotFound/table-not-found within a few rounds — that was the
 * documented pre-retention caveat this spec retires.
 */
class SnapshotReadSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val Grace = 10 * 60 * 1000L // longer than any test read

  private def tmpPath(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_snap").resolve(name).toString

  /** Run `read` in a loop on its own thread until `stop`, collecting
    * every throwable; the writer drives maintenance on the main
    * thread. Returns the reader's failures (must be empty) and how
    * many reads completed (must be > 0 for the test to mean anything). */
  private def withReader[A](read: () => A)(writer: => Unit)
      : (Seq[Throwable], Long) = {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var stop = false
    val t = new Thread(() => {
      while (!stop) {
        try { read(); reads.incrementAndGet() }
        catch { case e: Throwable => errors.add(e) }
      }
    }, "graft-snapshot-reader")
    t.setDaemon(true)
    t.start()
    try writer
    finally { stop = true; t.join(60000) }
    (errors.toArray(Array.empty[Throwable]).toSeq, reads.get())
  }

  test("bucketed index: classify+count loop never errors across concurrent retract + forced maintain swaps; vacuum(0) reclaims after") {
    val spark = TestSpark.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val reader = spark.newSession() // own relation cache, shared catalog
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val tbl = "graft_idx_snapshot"
    try {
      IndexStore.saveExact(
        IncrementalDedup.buildIndex(d.filter(col("doc_id") % 2 === 0),
          "doc_id", "text"),
        tbl, tmpPath(tbl), buckets = 8)
      val probe = d.limit(20)
      val (errs, reads) = withReader { () =>
        reader.catalog.refreshTable(tbl)
        val n = IncrementalDedup.classify(
          reader.read.parquet(s"$dir/documents.parquet")
            .select("doc_id", "text").limit(50),
          IndexStore.exactIndex(reader, tbl), "doc_id", "text").count()
        assert(n == 50L, s"classify must always see a complete index snapshot, got $n")
      } {
        (1 to 5).foreach { i =>
          IndexStore.appendExactKeepers(
            IncrementalDedup.classify(
              d.filter(col("doc_id") % 2 === 1)
                .select((col("doc_id") + i * 100000).as("doc_id"),
                  concat(col("text"), lit(s" v$i")).as("text")),
              IndexStore.exactIndex(spark, tbl), "doc_id", "text")
              .localCheckpoint(true), tbl)
          // forced compaction swap every round, retaining old files
          assert(IndexStore.maintain(spark, tbl, maxFilesPerBucket = 1,
            graceMs = Grace))
          // plus a takedown swap — the other rewrite a server overlaps
          IndexStore.retract(spark, tbl,
            spark.range(i * 100000 + 1, i * 100000 + 3)
              .select(col("id").as("keep_id")), graceMs = Grace)
        }
        val _ = probe
      }
      assert(errs.isEmpty, s"reader failed across swaps: ${errs.take(3).map(_.toString)}")
      assert(reads > 0, "the reader must have completed at least one read")
      // retention actually happened: retired dirs exist until vacuumed
      val reclaimed = IndexStore.vacuum(spark, tbl, graceMs = 0L)
      assert(reclaimed >= 5,
        s"each swap must retire its pre-swap directory (got $reclaimed)")
      assert(IndexStore.vacuum(spark, tbl, graceMs = 0L) == 0,
        "vacuum must clear the retired list")
    } finally Seq(tbl, tbl + "_compacting").foreach(
      t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("coded index: pruned search loop never errors across concurrent retractCoded + compactCoded cell swaps") {
    val spark = TestSpark.spark.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val reader = spark.newSession()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val model =
      ProductQuant.train(e, "vec_id", "embedding", m = 16, ksub = 16, iters = 2)
    val centroids =
      Clustering.train(e, "vec_id", "embedding", k = 8, iters = 3).centroids
    val coded = ProductQuant.buildCodedIndex(e, "vec_id", "embedding",
      centroids, model, ordered = false)
    val tbl = "graft_ivf_snapshot"
    try {
      IndexStore.saveCoded(coded, tbl, tmpPath(tbl),
        nlist = centroids.length, m = model.m)
      val q = e.filter(col("vec_id") < 5)
      val (errs, reads) = withReader { () =>
        reader.catalog.refreshTable(tbl)
        val rows = ProductQuant.ivfAdcTopKPruned(
          IndexStore.codedIndex(reader, tbl, centroids.length, model.m),
          q, "vec_id", "embedding", centroids, model, k = 5,
          nprobe = centroids.length, ordered = false).collect()
        assert(rows.nonEmpty, "search must always see a live snapshot")
      } {
        (1 to 4).foreach { i =>
          // takedown of a few ids → cell rewrite swaps
          IndexStore.retractCoded(spark, tbl,
            e.select("vec_id")
              .filter(col("vec_id") >= 100 + i * 10 && col("vec_id") < 105 + i * 10),
            "vec_id", centroids.length, model.m, graceMs = Grace)
          // append + forced compaction → more cell swaps
          IndexStore.appendCoded(
            ProductQuant.buildCodedIndex(
              e.filter(col("vec_id") >= 200 && col("vec_id") < 220)
                .select((col("vec_id") + 10000 * i).as("vec_id"), col("embedding")),
              "vec_id", "embedding", centroids, model, ordered = false),
            tbl, centroids.length, model.m)
          IndexStore.compactCoded(spark, tbl, centroids.length, model.m,
            maxFilesPerCell = 1, graceMs = Grace)
        }
      }
      assert(errs.isEmpty, s"reader failed across cell swaps: ${errs.take(3).map(_.toString)}")
      assert(reads > 0, "the reader must have completed at least one read")
      // final state is correct: retracted ids never come back
      spark.catalog.refreshTable(tbl)
      val retracted = (1 to 4).flatMap(i => (100 + i * 10) until (105 + i * 10)).toSet
      val post = ProductQuant.ivfAdcTopKPruned(
        IndexStore.codedIndex(spark, tbl, centroids.length, model.m),
        e.filter(col("vec_id") < 20), "vec_id", "embedding", centroids, model,
        k = 5, nprobe = centroids.length, ordered = false).collect()
      assert(post.nonEmpty)
      assert(!post.exists(r => retracted.contains(r.getLong(2).toInt)),
        "a search after the loop must never return a retracted id")
      // reclamation: grace 0 deletes every retired cell/root dir
      assert(IndexStore.vacuum(spark, tbl, graceMs = 0L) > 0)
      assert(IndexStore.vacuum(spark, tbl, graceMs = 0L) == 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
