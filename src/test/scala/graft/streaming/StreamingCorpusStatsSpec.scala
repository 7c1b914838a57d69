package graft.streaming

import graft.TestSpark
import graft.llm.Hll
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/**
 * Streaming corpus-stats laws:
 *
 *  - ACCUMULATION: counters SUM across batches; the HLL register table
 *    merges by register-wise MAX and EQUALS the sketch of the union of
 *    all batches (the Hll.merge semilattice law carried into state).
 *  - REPLAY: re-delivering an applied batch id changes nothing
 *    (counters would double-count without the watermark; the law pins
 *    the skip).
 *  - SNAPSHOT: the dashboard view derives the distinct estimate with
 *    the library's own estimator and never divides by zero.
 */
class StreamingCorpusStatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val m = 64

  test("batches accumulate exactly; merged registers equal the union sketch; replay is a no-op; streaming sink drives it") {
    val tbl = "graft_stream_stats"
    try {
      val b1 = Seq((1L, "a b c"), (2L, "a b c"), (3L, null: String))
        .toDF("doc_id", "text")
      val b2 = Seq((4L, "d e"), (5L, ""), (6L, "a b c")).toDF("doc_id", "text")

      assert(StreamingCorpusStats.applyBatch(b1, 0L, "text", tbl, m))
      assert(StreamingCorpusStats.applyBatch(b2, 1L, "text", tbl, m))
      def snap(): Map[String, Double] =
        StreamingCorpusStats.snapshot(spark, tbl, m)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val s = snap()
      assert(s("n_docs") == 6.0 && s("n_null_text") == 1.0)
      assert(s("n_empty_text") == 1.0) // "" in batch 2
      assert(s("n_tokens") == 11.0) // (3 + 3) + (2 + 0 + 3)
      assert(s("n_text_docs") == 5.0)
      // distinct contents: "a b c" (3x across batches), "d e", "" → the
      // stored registers equal the union sketch, so the estimate equals
      // the batch-union estimate EXACTLY
      val union = b1.unionByName(b2).filter(col("text").isNotNull)
        .select(graft.llm.TextOps.md5Hex(col("text").cast("string")).as("_h"))
      val want = Hll.estimate(Hll.sketch(union, "_h", m, ordered = false), m)
      assert(s("approx_distinct_contents") == want,
        "stored registers must be the union sketch, register for register")
      assert(s("approx_dup_rate") == math.max(0.0, 1.0 - want / 5.0))
      // replay: an already-applied batch id is skipped whole
      assert(!StreamingCorpusStats.applyBatch(b1, 1L, "text", tbl, m))
      assert(snap() == s, "replayed batch must change nothing")
      // a genuinely new batch still lands after the replay
      assert(StreamingCorpusStats.applyBatch(
        Seq((7L, "f g")).toDF("doc_id", "text"), 2L, "text", tbl, m))
      assert(snap()("n_docs") == 7.0)

      // the streaming sink drives the same path end-to-end
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = StreamingCorpusStats.sink(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", tbl, m)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_stats_chk").toString)
        .start()
      input.addData((1L, "a b c"), (2L, "a b c"))
      q.processAllAvailable()
      input.addData((3L, "d e"))
      q.processAllAvailable()
      val s2 = snap()
      assert(s2("n_docs") == 3.0 && s2("n_tokens") == 8.0)
      q.stop()
    } finally spark.sql(s"DROP TABLE IF EXISTS graft_stream_stats")
  }

  test("register count m is stamped state: a drifted m fails fast on applyBatch AND snapshot, matching m still applies") {
    val tbl = "graft_stream_stats_m"
    try {
      val b1 = Seq((1L, "a b c")).toDF("doc_id", "text")
      assert(StreamingCorpusStats.applyBatch(b1, 0L, "text", tbl, m))
      // merging a different register count would be silent garbage —
      // the growing direction the old rhos-fit guard could not catch
      val e = intercept[IllegalArgumentException] {
        StreamingCorpusStats.applyBatch(
          Seq((2L, "d e")).toDF("doc_id", "text"), 1L, "text", tbl, m * 2)
      }
      assert(e.getMessage.contains(s"m=$m"))
      intercept[IllegalArgumentException] {
        StreamingCorpusStats.snapshot(spark, tbl, m / 2)
      }
      // the matching m still applies and estimates
      assert(StreamingCorpusStats.applyBatch(
        Seq((2L, "d e")).toDF("doc_id", "text"), 1L, "text", tbl, m))
      val s = StreamingCorpusStats.snapshot(spark, tbl, m)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(s("n_docs") == 2.0)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft_stream_stats_m")
  }

  test("snapshot of an empty/counter-only table reports zeros, never divides by zero") {
    val tbl = "graft_stream_stats_empty"
    try {
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      assert(StreamingCorpusStats.applyBatch(empty, 0L, "text", tbl, 64))
      val s = StreamingCorpusStats.snapshot(spark, tbl, 64)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(s("n_docs") == 0.0 && s("approx_distinct_contents") == 0.0)
      assert(s("approx_dup_rate") == 0.0)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft_stream_stats_empty")
  }
}
