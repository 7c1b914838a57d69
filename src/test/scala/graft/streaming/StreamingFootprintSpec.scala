package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * The maintained per-stratum footprint: delta-append batches, fold on
 * read, compact on cadence.
 *
 *  - ACCUMULATION: after batches B1, B2 the snapshot equals the batch
 *    aggregate over B1 ∪ B2, null stratum included as its own group.
 *  - REPLAY FENCE: a batch id ≤ the max applied id is skipped whole
 *    (returns false, zero rows written) — including after compaction
 *    collapses the log (the fence rides the folded rows' batch_id).
 *  - COMPACTION: snapshot-identical, one row per stratum, and later
 *    appends + fences keep working on the swapped table.
 *  - STREAMING: the sink drains a MemoryStream replay into the same
 *    state the batch calls build.
 */
class StreamingFootprintSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def freshTable(tag: String): (String, String) = {
    val tbl = s"graft_footprint_$tag"
    (tbl, Files.createTempDirectory(s"graft_fp_$tag").resolve(tbl).toString)
  }

  private def snap(tbl: String): Set[(String, Long, Long)] = {
    spark.catalog.refreshTable(tbl)
    StreamingFootprint.snapshot(spark, tbl, ordered = false).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1), r.getLong(2))).toSet
  }

  private val b1 = Seq(("a", Some(10L)), ("a", Some(5L)), ("b", Some(7L)),
    (null: String, Some(3L))).toDF("src", "toks")
  private val b2 = Seq(("a", Some(2L)), ("c", None: Option[Long]))
    .toDF("src", "toks")

  test("accumulation, replay fence, and compaction keep the same report") {
    val (tbl, path) = freshTable("law")
    try {
      assert(StreamingFootprint.applyBatch(b1, 0L, "src", "toks", tbl, path))
      assert(StreamingFootprint.applyBatch(b2, 1L, "src", "toks", tbl, path))
      val expect = Set(("a", 3L, 17L), ("b", 1L, 7L),
        (null: String, 1L, 3L), ("c", 1L, 0L))
      assert(snap(tbl) == expect)

      // replay of either applied id: skipped whole
      assert(!StreamingFootprint.applyBatch(b1, 0L, "src", "toks", tbl, path))
      assert(!StreamingFootprint.applyBatch(b2, 1L, "src", "toks", tbl, path))
      assert(snap(tbl) == expect)

      // compaction: one row per stratum, identical snapshot
      StreamingFootprint.compact(spark, tbl, path)
      spark.catalog.refreshTable(tbl)
      assert(spark.table(tbl).count() == 4L, "one folded row per stratum")
      assert(graft.llm.IndexStore.dataFileCount(spark, tbl) == 1,
        "the fold must land in one file (the delta log was one per batch)")
      assert(snap(tbl) == expect)

      // the fence survives the fold: old ids still skip...
      assert(!StreamingFootprint.applyBatch(b1, 0L, "src", "toks", tbl, path))
      assert(snap(tbl) == expect)
      // ...and new batches still apply on the swapped table
      assert(StreamingFootprint.applyBatch(
        Seq(("b", Some(1L))).toDF("src", "toks"), 2L, "src", "toks", tbl, path))
      assert(snap(tbl) == expect.map {
        case ("b", d, t) => ("b", d + 1L, t + 1L); case x => x
      })
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("the sink drains a stream into the same state, compacting on cadence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (tbl, path) = freshTable("sink")
    try {
      val input = MemoryStream[(String, Long)]
      val q = StreamingFootprint.sink(
        input.toDF().toDF("src", "toks"), "src", "toks", tbl, path,
        compactEvery = 2)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_fp_chk").toString)
        .start()
      input.addData(("a", 10L), ("b", 7L))
      q.processAllAvailable()
      input.addData(("a", 2L))
      q.processAllAvailable()
      q.stop()
      assert(snap(tbl) == Set(("a", 2L, 12L), ("b", 1L, 7L)))
      // cadence hit at batch 2: the log is folded to one row/stratum
      spark.catalog.refreshTable(tbl)
      assert(spark.table(tbl).count() == 2L,
        "the cadence's compact must fold the delta log")

      // a fresh-checkpoint replay of the same source: ids restart at 0,
      // land under the fence, and change nothing
      val replay = MemoryStream[(String, Long)]
      val q2 = StreamingFootprint.sink(
        replay.toDF().toDF("src", "toks"), "src", "toks", tbl, path,
        compactEvery = 0)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_fp_chk2").toString)
        .start()
      replay.addData(("a", 10L), ("b", 7L))
      q2.processAllAvailable()
      q2.stop()
      assert(snap(tbl) == Set(("a", 2L, 12L), ("b", 1L, 7L)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
