package graft.streaming

import graft.TestSpark
import graft.operators.GroupByNest
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming ingest bridging to the batch operators (SURVEY.md §2.10). */
class StreamingExtractSpec extends AnyFunSuite {
  import TestSpark.spark

  test("csvStream + foreachBatch runs the batch extraction per micro-batch") {
    val dir = Files.createTempDirectory("graft-stream")
    Files.write(dir.resolve("drop1.csv"),
      "Subject Id,Visit,Value\nS1,v1,10\nS1,v2,20\nS2,v1,30\n".getBytes("UTF-8"))

    val schema = StructType.fromDDL("`Subject Id` STRING, Visit STRING, Value STRING")
    val stream = StreamingExtract.csvStream(spark, dir.toString, schema)
    assert(stream.isStreaming)
    assert(stream.columns.toSeq == Seq("subject_id", "visit", "value"))

    val collected = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val q = StreamingExtract.perBatch(stream, (df, _) => {
      // the unchanged batch operator, applied per micro-batch
      GroupByNest(df, "subject_id").collect().foreach { r =>
        collected += r.getString(0) -> r.getSeq[Row](1).length
      }
    }).option("checkpointLocation",
      Files.createTempDirectory("graft-stream-chk").toString)
      .start()
    q.awaitTermination(60000)
    assert(collected.toMap == Map("S1" -> 2, "S2" -> 1))
  }

  test("StreamingDedup: first content wins within and across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup(input.toDF().toDF("id", "text"), "id", "text")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dedup-chk").toString)
      .start()
    def emitted(): Map[String, String] =
      spark.table("dedup_out").collect()
        .map(r => r.getString(1) -> r.getString(0)).toMap

    // batch 1: two copies of A (min id 1 wins) + B
    input.addData((2L, "content A"), (1L, "content A"), (3L, "content B"))
    q.processAllAvailable()
    assert(emitted() == Map("1" -> md5hex("content A"), "3" -> md5hex("content B")))

    // batch 2: A re-sent with a new id (dropped — state remembers), C new
    input.addData((9L, "content A"), (4L, "content C"))
    q.processAllAvailable()
    assert(emitted() == Map("1" -> md5hex("content A"), "3" -> md5hex("content B"),
      "4" -> md5hex("content C")))
    q.stop()
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("StreamingIncremental: stream-static classify against an index, stateless across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val index = graft.llm.IncrementalDedup.buildIndex(
      Seq((10L, "history A"), (11L, "history A"), (12L, "history B"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingIncremental.classify(
      input.toDF().toDF("doc_id", "text"), index, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("incr_out")
      .outputMode("append").start()
    def got(): Map[Long, (String, Any)] =
      spark.table("incr_out").collect()
        .map(r => r.getLong(0) -> ((r.getString(2),
          if (r.isNullAt(3)) null else r.getLong(3)))).toMap

    input.addData((100L, "history A"), (101L, "fresh X"))
    q.processAllAvailable()
    assert(got() == Map(
      100L -> (("dup_of_history", 10L)), // index keeper = min history id
      101L -> (("new", null))))

    // stateless: the same unseen content arriving again is `new` again
    // (in-stream dedup is StreamingDedup's job — the ops compose)
    input.addData((102L, "fresh X"), (103L, "history B"))
    q.processAllAvailable()
    assert(got()(102L) == (("new", null)))
    assert(got()(103L) == (("dup_of_history", 12L)))
    q.stop()
  }

  test("StreamingSessionize: batch-closed sessions emit immediately, watermark closes the rest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamingSessionize(input.toDF().toDF("user_id", "ts"),
      "user_id", "ts", gapSeconds = 1800L, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess-chk").toString)
      .start()
    def emitted() = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3))).toSet

    // batch 1: user 1 has two close events; user 2 one — all sessions open
    input.addData((1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 10:10:00")),
      (2L, ts("2026-01-01 10:00:00")))
    q.processAllAvailable()
    assert(emitted().isEmpty)

    // batch 2: user 1 reappears past the gap — the first session closes
    // in-batch; the watermark (12:00 - 1h) then passes user 2's
    // end + gap (10:30), so a further batch times user 2 out
    input.addData((1L, ts("2026-01-01 12:00:00")))
    q.processAllAvailable()
    // user 1's first session closed in-batch; user 2's closes via the
    // event-time timeout once the advanced watermark (11:00) is applied —
    // processAllAvailable may already run that extra batch
    assert(emitted().contains(
      (1L, "2026-01-01 10:00:00.0", "2026-01-01 10:10:00.0", 2L)))

    input.addData((3L, ts("2026-01-01 12:30:00")))
    q.processAllAvailable()
    assert(emitted().contains((2L, "2026-01-01 10:00:00.0", "2026-01-01 10:00:00.0", 1L)))
    // user 1's open 12:00 session and user 3's are still open — not emitted
    assert(!emitted().exists(s => s._2.startsWith("2026-01-01 12:")))
    q.stop()
  }

  test("windowed event counts aggregate a batch frame identically to streaming semantics") {
    // the aggregation expression is streaming-ready (watermark + window);
    // batch execution verifies the arithmetic
    val events = TestSpark.df("ts TIMESTAMP, event_type STRING, value DOUBLE", Seq(
      Row(java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), "click", 1.0),
      Row(java.sql.Timestamp.valueOf("2026-01-01 10:55:00"), "click", 2.0),
      Row(java.sql.Timestamp.valueOf("2026-01-01 11:05:00"), "view", 5.0)))
    val out = StreamingExtract.windowedEventCounts(events, "ts", "event_type", "value")
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("event_type") == "click")
    assert(out(0).getAs[Long]("n") == 2L)
    assert(out(0).getAs[Double]("total") == 3.0)
    assert(out(1).getAs[String]("event_type") == "view")
  }
}
