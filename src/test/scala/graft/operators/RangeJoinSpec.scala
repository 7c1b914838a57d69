package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def run(points: Seq[(Int, Long)], intervals: Seq[(Int, Long, Long, String)],
      bucket: Long = 10): Set[(Int, Long, String)] =
    RangeJoin(
      points.map { case (k, t) => (k, ts(t)) }.toDF("k", "ts"),
      intervals.map { case (k, s, e, v) => (k, ts(s), ts(e), v) }
        .toDF("k", "start", "end", "v"),
      Seq("k"), "ts", "start", "end", bucketSeconds = bucket)
      .collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).getTime / 1000L, r.getString(4)))
      .toSet

  test("points match every containing interval of their key, bounds inclusive") {
    val got = run(
      points = Seq((1, 5L), (1, 10L), (1, 20L), (1, 31L), (2, 10L)),
      intervals = Seq(
        (1, 10L, 30L, "A"),  // contains 10 (start-inclusive), 20, 30
        (1, 15L, 25L, "B"),  // contains 20 only
        (2, 0L, 50L, "C")))
    assert(got == Set(
      (1, 10L, "A"), (1, 20L, "A"),
      (1, 20L, "B"),
      (2, 10L, "C")))
  }

  test("intervals spanning many buckets still match exactly once per point") {
    // bucket=10, interval covers 4 buckets; the point meets it only in
    // its own bucket, so no duplicate rows without any distinct
    val got = run(
      points = Seq((1, 25L)),
      intervals = Seq((1, 0L, 39L, "wide")))
    assert(got == Set((1, 25L, "wide")))
  }

  test("inverted intervals (start > end) match nothing instead of erroring") {
    assert(run(Seq((1, 10L)), Seq((1, 30L, 5L, "bad"))) == Set.empty)
  }

  test("the plan is an equi-join on (key, bucket) — never cartesian") {
    val p = Seq((1, ts(5L))).toDF("k", "ts")
    val i = Seq((1, ts(0L), ts(10L), "v")).toDF("k", "start", "end", "v")
    val plan = RangeJoin(p, i, Seq("k"), "ts", "start", "end", 10)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"range join degenerated:\n$plan")
  }

  test("null timestamps and null bounds drop out cleanly (no null-key matches)") {
    val p = Seq((1, Option(ts(5L))), (1, Option.empty[java.sql.Timestamp]))
      .toDF("k", "ts")
    val i = Seq(
      (1, Option(ts(0L)), Option(ts(10L)), "ok"),
      (1, Option.empty[java.sql.Timestamp], Option(ts(10L)), "null_start"))
      .toDF("k", "start", "end", "v")
    val got = RangeJoin(p, i, Seq("k"), "ts", "start", "end", 10)
      .collect().map(_.getString(4)).toSeq
    assert(got == Seq("ok")) // null-ts point and null-bound interval match nothing
  }

  test("column collisions outside the keys are rejected up front") {
    val p = Seq((1, ts(5L), "x")).toDF("k", "ts", "v")
    val i = Seq((1, ts(0L), ts(10L), "y")).toDF("k", "start", "end", "v")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin(p, i, Seq("k"), "ts", "start", "end", 10)
    }
    assert(ex.getMessage.contains("collide"))
  }
}
