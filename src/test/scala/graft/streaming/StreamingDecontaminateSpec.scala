package graft.streaming

import graft.TestSpark
import graft.llm.Decontamination
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * The streaming decontamination loop: [[StreamingDecontaminate.sink]]
 * audits each micro-batch against the persisted eval-shingle index,
 * accumulates the matched state, and annotates every doc clean /
 * contaminated.
 *
 *  - GATE: a batch doc carrying an eval doc's text verbatim reaches
 *    containment 1.0 and classifies `contaminated`; disjoint text
 *    classifies `clean` at containment 0.0.
 *  - ACCUMULATION LAW: after batches B1, B2, `containmentState` equals
 *    the one-shot `containment(B1 ∪ B2, eval)` — no corpus rescan.
 *  - REPLAY CONVERGENCE: re-delivering a batch through a FRESH query
 *    appends nothing to the matched state and emits the identical
 *    annotation.
 */
class StreamingDecontaminateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val evalDocs = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "zeta eta theta iota kappa"))

  // batch 1: doc 1 = eval 100 verbatim (containment 1), doc 2 disjoint;
  // batch 2: doc 3 = half of eval 101's shingles, doc 4 disjoint
  private val b1 = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "one two three four five"))
  private val b2 = Seq(
    (3L, "zeta eta theta iota unrelated tail words here"),
    (4L, "six seven eight nine ten"))

  private def freshIndex(tag: String): (String, String, String) = {
    val tbl = s"graft_sdecon_idx_$tag"
    val matched = s"graft_sdecon_matched_$tag"
    val base = Files.createTempDirectory(s"graft_sdecon_$tag")
    Decontamination.saveEvalShingleIndex(
      evalDocs.toDF("doc_id", "text"), "doc_id", "text",
      tbl, base.resolve(tbl).toString, shingleN = 3, buckets = 2)
    (tbl, matched, base.resolve(matched).toString)
  }

  private def runBatches(tbl: String, matched: String, matchedPath: String,
      batches: Seq[Seq[(Long, String)]],
      out: scala.collection.mutable.Map[Long, (Double, String)]): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    def onBatch(annotated: DataFrame, batchId: Long): Unit =
      out.synchronized {
        annotated.select("doc_id", "containment", "status").collect()
          .foreach(r => out(r.getLong(0)) = (r.getDouble(1), r.getString(2)))
      }
    val q = StreamingDecontaminate.sink(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      tbl, matched, matchedPath, threshold = 0.5, onBatch)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sdecon_chk").toString)
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
  }

  private def stateRows(tbl: String, matched: String)
      : Set[(Long, Long, Long, Double)] = {
    spark.catalog.refreshTable(matched)
    Decontamination.containmentState(spark, tbl, matched, ordered = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  test("sink gates per doc and the matched state obeys the accumulation law") {
    val (tbl, matched, matchedPath) = freshIndex("law")
    try {
      val out = scala.collection.mutable.Map[Long, (Double, String)]()
      runBatches(tbl, matched, matchedPath, Seq(b1, b2), out)

      // the gate: verbatim eval text → containment 1.0, contaminated;
      // the half-overlap doc 3 has 6 shingles, 2 of them eval 101's
      // ("zeta eta theta", "eta theta iota") → 0.333 < 0.5 → clean
      assert(out(1L) == ((1.0, "contaminated")))
      assert(out(2L) == ((0.0, "clean")))
      assert(out(3L)._2 == "clean" && out(3L)._1 < 0.5 && out(3L)._1 > 0.0)
      assert(out(4L) == ((0.0, "clean")))

      // accumulation law: state ≡ one-shot containment(B1 ∪ B2, eval)
      val oneShot = Decontamination.containment(
        (b1 ++ b2).toDF("doc_id", "text"),
        evalDocs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, ordered = false)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(stateRows(tbl, matched) == oneShot,
        "containmentState after B1, B2 must equal the one-shot audit")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS $matched")
    }
  }

  test("replay through a fresh query appends nothing and re-emits the identical annotation") {
    val (tbl, matched, matchedPath) = freshIndex("replay")
    try {
      val out1 = scala.collection.mutable.Map[Long, (Double, String)]()
      runBatches(tbl, matched, matchedPath, Seq(b1), out1)
      spark.catalog.refreshTable(matched)
      val before = spark.table(matched).count()

      val out2 = scala.collection.mutable.Map[Long, (Double, String)]()
      runBatches(tbl, matched, matchedPath, Seq(b1), out2)
      spark.catalog.refreshTable(matched)
      assert(spark.table(matched).count() == before,
        "a replayed batch must append zero matched rows")
      assert(out2.toMap == out1.toMap,
        "replay must emit the identical annotation")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS $matched")
    }
  }

  test("the matched-state append log compacts to one file with identical state, and keeps learning after the swap") {
    val (tbl, matched, matchedPath) = freshIndex("compact")
    try {
      val out = scala.collection.mutable.Map[Long, (Double, String)]()
      runBatches(tbl, matched, matchedPath, Seq(b1, b2), out)
      val before = stateRows(tbl, matched)

      Decontamination.compactMatched(spark, matched, matchedPath)
      spark.catalog.refreshTable(matched)
      assert(graft.llm.IndexStore.dataFileCount(spark, matched) == 1,
        "compaction must fold the one-file-per-batch append log")
      assert(stateRows(tbl, matched) == before,
        "compaction must not change the matched state")

      // the audit keeps appending into the swapped table: a new batch
      // hitting a previously-unmatched eval shingle adds state
      val b3 = Seq((9L, "theta iota kappa padding words"))
      val out2 = scala.collection.mutable.Map[Long, (Double, String)]()
      runBatches(tbl, matched, matchedPath, Seq(b3), out2)
      assert(stateRows(tbl, matched) != before,
        "a fresh hit after compaction must still append")

      // compacting a non-existent table is a no-op, not an error
      Decontamination.compactMatched(spark, "graft_sdecon_nope", "/tmp/nope")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS $matched")
    }
  }

  test("threshold outside (0, 1] is refused") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    intercept[IllegalArgumentException] {
      StreamingDecontaminate.sink(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", "t", "m", "/tmp/x", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      StreamingDecontaminate.sink(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", "t", "m", "/tmp/x", threshold = 1.5)
    }
  }
}
