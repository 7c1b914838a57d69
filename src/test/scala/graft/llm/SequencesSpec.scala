package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/**
 * Session-sequence laws (arithmetic is oracle-pinned in pq65):
 *
 *  - the gap rule splits sessions exactly at > gapSec;
 *  - the sequence string lists tokens in (ts, tie) order and its
 *    length agrees with n_events;
 *  - deterministic across partitionings (sorted-struct collect);
 *  - null tokens render as empty without desyncing counts.
 */
class SequencesSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def fixture = TestSpark.df(
    "user_id bigint, ts timestamp, event_id bigint, event_type string", Seq(
      Row(1L, ts(0), 1L, "view"), Row(1L, ts(100), 2L, "click"),
      Row(1L, ts(1901), 3L, "buy"), // 1801s after click -> new session
      Row(1L, ts(1902), 4L, null), // null token renders ""
      Row(2L, ts(0), 5L, "view")))

  test("gap rule, ordering, and null-token rendering") {
    val got = Sequences.sessionSequences(fixture, "user_id", "ts", "event_id",
      "event_type", gapSec = 1800L, ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    assert(got == Map(
      (1L, 1L) -> (2L, "view click"),
      (1L, 2L) -> (2L, "buy "), // null token -> empty, count intact
      (2L, 1L) -> (1L, "view")))
  }

  test("deterministic across partitionings on real events") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def run(parts: Int) = Sequences.sessionSequences(e.repartition(parts),
      "user_id", "ts", "event_id", "event_type", ordered = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(run(1) == run(13))
  }

  test("sequence length always agrees with n_events") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    Sequences.sessionSequences(e, "user_id", "ts", "event_id", "event_type",
      ordered = false).collect().foreach { r =>
      val n = r.getLong(2)
      val toks = r.getString(3).split(" ", -1).length
      assert(toks == n, s"session (${r.getLong(0)},${r.getLong(1)}): $toks tokens vs $n events")
    }
  }
}
