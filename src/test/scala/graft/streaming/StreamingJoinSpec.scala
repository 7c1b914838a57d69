package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/**
 * Stream-stream interval join laws (the batch identity is
 * oracle-pinned in pq56):
 *
 *  - matches emit across micro-batches (the right row may arrive
 *    batches after its left partner — symmetric buffering);
 *  - the interval is closed on both ends;
 *  - rows outside the interval or on different keys never pair;
 *  - the degenerate interval refuses upper < lower.
 */
class StreamingJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("matches emit across micro-batches; interval closed on both ends") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val buys = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamingJoin.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      buys.toDF().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", Seq("event_id"), lowerSec = 0L, upperSec = 60L,
      watermark = "30 seconds")
      .select(col("user_id"), col("l_event_id"), col("r_event_id"))
    val q = out.writeStream.format("memory").queryName("sj_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sj-chk").toString)
      .start()
    def pairs(): Set[(Long, Long, Long)] =
      spark.table("sj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch 1: clicks only — nothing can match yet
    clicks.addData((1L, ts(100), 10L), (2L, ts(100), 11L))
    q.processAllAvailable()
    assert(pairs().isEmpty)

    // batch 2: purchases — u1 at +60 (inclusive upper bound: matches),
    // u1 at +61 (outside), u2 at +0 (inclusive lower bound: matches),
    // u3 (no click: never pairs)
    buys.addData((1L, ts(160), 20L), (1L, ts(161), 21L),
      (2L, ts(100), 22L), (3L, ts(100), 23L))
    q.processAllAvailable()
    assert(pairs() == Set((1L, 10L, 20L), (2L, 11L, 22L)))

    // batch 3: a late-but-within-delay click (ts 90 >= left watermark
    // 100 - 30) whose window covers an already-buffered buy — symmetric
    // buffering matches it batches later
    clicks.addData((3L, ts(90), 12L))
    q.processAllAvailable()
    assert(pairs() == Set((1L, 10L, 20L), (2L, 11L, 22L), (3L, 12L, 23L)))

    // batch 4: a click BEHIND the watermark (ts 50 < 70) is dropped as
    // late data even though its interval covers u2's buffered buy —
    // the state bound is real, not advisory
    clicks.addData((2L, ts(50), 13L))
    q.processAllAvailable()
    assert(pairs() == Set((1L, 10L, 20L), (2L, 11L, 22L), (3L, 12L, 23L)))
    q.stop()
  }

  test("upper < lower is refused") {
    val df = spark.range(1).select(col("id").as("user_id"),
      current_timestamp().as("ts"), col("id").as("event_id"))
    assertThrows[IllegalArgumentException] {
      StreamingJoin.intervalJoin(df, df, "user_id", "ts", Seq("event_id"),
        lowerSec = 10L, upperSec = 5L)
    }
  }
}
