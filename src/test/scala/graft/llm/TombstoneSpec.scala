package graft.llm

import graft.TestSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Tombstone retraction laws — O(ids) takedown latency for the bucketed
 * indexes (buckets are not partitions, so a physical delete is always
 * a full rewrite; the tombstone sidecar makes the OBSERVABLE delete
 * immediate and defers the physical one to the next rewrite):
 *
 *  1. EQUIVALENCE: classify against a tombstoned index ≡ classify
 *     after a full [[IndexStore.retract]] of the same ids — for the
 *     exact AND the minhash index.
 *  2. O(ids): the tombstone call itself never touches an index file.
 *  3. FOLD+CLEAR: the next maintain compaction (and any retract)
 *     physically removes tombstoned rows and drops the sidecar.
 *  4. RE-ACCEPT: tombstoned content re-accepts as `new` under a fresh
 *     keeper, exactly like a physical retraction.
 *  5. PLAN: the anti-join is broadcast on the sidecar side — classify
 *     keeps zero exchange above the bucketed index scan.
 */
class TombstoneSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planSession(buckets: Int): SparkSession = {
    val s2 = TestSpark.spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", buckets.toString)
    s2
  }

  private def tmpPath(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_ts").resolve(name).toString

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSeq.sortBy(_.mkString("|"))

  private def reachesScanBeforeJoin(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
    case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
    case other => other.children.exists(reachesScanBeforeJoin)
  }

  /** Shuffle exchanges between the bucketed index scan and its first
    * join. The tombstone anti-join's BROADCAST exchange sits on the
    * SIDECAR side by design, so only shuffles count here: a shuffle
    * with the index scan below it would mean the bucketing was lost. */
  private def shufflesAboveIndexScan(plan: SparkPlan): Seq[Exchange] =
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.children.exists(reachesScanBeforeJoin) => e
    }

  private def dataFiles(s: SparkSession, tbl: String): Set[(String, Long)] = {
    val loc = new java.io.File(new java.net.URI(
      s.sessionState.catalog.getTableMetadata(
        s.sessionState.sqlParser.parseTableIdentifier(tbl)).location.toString))
    loc.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).toSet
  }

  test("exact index: tombstone classify ≡ full-retract classify; O(ids) takedown; maintain folds+clears; re-accept as new; plan exchange-free") {
    val s2 = planSession(buckets = 8)
    val d = s2.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val history = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") < 40)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val tblT = "graft_ts_exact"       // tombstoned
    val tblR = "graft_ts_exact_ref"   // physically retracted (the oracle)
    val takedown = (0L until 10L by 2L).toSeq
    try {
      val index = IncrementalDedup.buildIndex(history, "doc_id", "text")
      IndexStore.saveExact(index, tblT, tmpPath(tblT), buckets = 8)
      IndexStore.saveExact(index, tblR, tmpPath(tblR), buckets = 8)
      import s2.implicits._
      val ids = takedown.toDF("keep_id")

      // O(ids): the takedown call leaves every index file untouched
      val filesBefore = dataFiles(s2, tblT)
      assert(IndexStore.tombstone(s2, tblT, ids) == takedown.size)
      assert(dataFiles(s2, tblT) == filesBefore,
        "a tombstone takedown must never rewrite the index")
      // idempotent: re-delivery records nothing new
      assert(IndexStore.tombstone(s2, tblT, ids) == 0L)

      // the oracle: a full physical retraction of the same ids
      assert(IndexStore.retract(s2, tblR, ids) > 0L)

      // EQUIVALENCE law — observable index and classify output identical
      assert(sortedRows(IndexStore.exactIndex(s2, tblT)) ==
        sortedRows(IndexStore.exactIndex(s2, tblR)))
      val classifyT = IncrementalDedup.classify(
        batch, IndexStore.exactIndex(s2, tblT), "doc_id", "text")
      assert(sortedRows(classifyT) == sortedRows(IncrementalDedup.classify(
        batch, IndexStore.exactIndex(s2, tblR), "doc_id", "text")))

      // PLAN law: no shuffle between the bucketed index scan and the
      // classify join, tombstone anti-join present or not
      assert(shufflesAboveIndexScan(classifyT.queryExecution.executedPlan).isEmpty,
        s"tombstone filter must not re-shuffle the index:\n${classifyT.queryExecution.executedPlan}")

      // RE-ACCEPT law: tombstoned content classifies new and its fresh
      // keeper takes over in the observable index
      val resub = history.filter(col("doc_id") === takedown.head)
        .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      val reclass = IncrementalDedup.classify(
        resub, IndexStore.exactIndex(s2, tblT), "doc_id", "text")
        .localCheckpoint(true)
      assert(reclass.select("status").collect().map(_.getString(0)).toSeq ==
        Seq("new"), "tombstoned content must re-accept as new")
      IndexStore.appendExactKeepers(reclass, tblT)
      val visible = IndexStore.exactIndex(s2, tblT)
        .filter(col("keep_id") === takedown.head + 500000)
      assert(visible.count() == 1L, "the fresh keeper must be visible")

      // FOLD+CLEAR law: a forced maintain compaction removes the rows
      // physically and drops the sidecar
      assert(IndexStore.maintain(s2, tblT, maxFilesPerBucket = 1))
      assert(!s2.catalog.tableExists(tblT + "_tombstones"),
        "maintain must clear the folded sidecar")
      val raw = s2.table(tblT)
      assert(raw.filter(col("keep_id").isin(takedown.map(Long.box): _*))
        .count() == 0L, "folded rows must be physically gone")
      // and the re-accepted keeper survived the fold
      assert(raw.filter(col("keep_id") === takedown.head + 500000).count() == 1L)
    } finally Seq(tblT, tblR, tblT + "_tombstones", tblR + "_tombstones",
      tblT + "_compacting", tblR + "_compacting")
      .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("minhash index: tombstone classify ≡ full-retract classify; retract folds pending tombstones and clears; props survive the fold") {
    val s2 = planSession(buckets = 8)
    val d = s2.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val history = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") < 40)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val tblT = "graft_ts_mh"
    val tblR = "graft_ts_mh_ref"
    val takedown = (0L until 10L by 2L).toSeq
    try {
      val index = IncrementalMinHash.buildIndex(history, "doc_id", "text")
      IndexStore.saveMinhash(index, tblT, tmpPath(tblT), buckets = 8)
      IndexStore.saveMinhash(index, tblR, tmpPath(tblR), buckets = 8)
      import s2.implicits._
      val ids = takedown.toDF("keep_id")
      assert(IndexStore.tombstone(s2, tblT, ids) == takedown.size)
      assert(IndexStore.retract(s2, tblR, ids) > 0L)
      assert(sortedRows(IndexStore.minhashIndex(s2, tblT)) ==
        sortedRows(IndexStore.minhashIndex(s2, tblR)))
      assert(sortedRows(IncrementalMinHash.classifyBanded(batch,
        IndexStore.minhashIndex(s2, tblT), "doc_id", "text")) ==
        sortedRows(IncrementalMinHash.classifyBanded(batch,
          IndexStore.minhashIndex(s2, tblR), "doc_id", "text")))

      // a LATER retract of different ids folds the pending tombstones
      // too, and clears the sidecar
      val more = Seq(10L, 12L).toDF("keep_id")
      assert(IndexStore.retract(s2, tblT, more) > 0L)
      assert(!s2.catalog.tableExists(tblT + "_tombstones"),
        "retract must clear the folded sidecar")
      val gone = takedown ++ Seq(10L, 12L)
      assert(s2.table(tblT)
        .filter(col("keep_id").isin(gone.map(Long.box): _*)).count() == 0L,
        "retract must fold pending tombstones physically")
      // sketch props survived (drift still fails fast)
      intercept[IllegalArgumentException] {
        IndexStore.minhashIndex(s2, tblT, numHashes = 18, bands = 6)
      }
    } finally Seq(tblT, tblR, tblT + "_tombstones", tblR + "_tombstones",
      tblT + "_compacting", tblR + "_compacting")
      .foreach(t => s2.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
