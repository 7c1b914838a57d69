package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Corpus snapshot diff + priority-keeper dedup laws (both oracle-pinned
 * in pq73/pq74): classification of every delta kind, null-text
 * equality, unchanged suppression, and the argmin(priority, id) keeper.
 */
class CorpusDiffSpec extends AnyFunSuite {
  import TestSpark.spark

  test("diff classifies added/removed/changed; unchanged suppressed by default") {
    val old = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "same"), Row(2L, "will change"), Row(3L, "will vanish"),
      Row(4L, null), Row(5L, null)))
    val neu = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "same"), Row(2L, "changed"), Row(6L, "fresh"),
      Row(4L, null), Row(5L, "materialized")))
    val got = CorpusDiff.diff(old, neu, "doc_id", "text", ordered = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: unchanged (suppressed); 4: null == null -> unchanged (suppressed)
    assert(got == Map(2L -> "changed", 3L -> "removed", 6L -> "added", 5L -> "changed"))
    val all = CorpusDiff.diff(old, neu, "doc_id", "text",
      includeUnchanged = true, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "unchanged" && all(4L) == "unchanged" && all.size == 6)
  }

  test("priority keeper: lowest (priority, id) wins; count is exact") {
    val df = TestSpark.df("doc_id bigint, text string, rank bigint", Seq(
      Row(10L, "x", 5L), Row(11L, "x", 2L), Row(12L, "x", 2L), // keeper 11
      Row(20L, "y", 9L),                                        // singleton
      Row(30L, null, 1L), Row(31L, null, 0L)))                  // null group, keeper 31
    val got = ExactDedup.withPriority(df, "doc_id", "text", "rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((11L, 2L, 3L), (20L, 9L, 1L), (31L, 0L, 2L)))
  }

  test("null ids are excluded from the diff (no spurious added+removed pair)") {
    val old = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "x"), Row(null.asInstanceOf[java.lang.Long], "same")))
    val neu = TestSpark.df("doc_id bigint, text string", Seq(
      Row(1L, "x"), Row(null.asInstanceOf[java.lang.Long], "same")))
    assert(CorpusDiff.diff(old, neu, "doc_id", "text", ordered = false).count() == 0)
  }

  test("null priority ranks LAST: an unscored copy never beats a scored one") {
    val df = TestSpark.df("doc_id bigint, text string, rank bigint", Seq(
      Row(1L, "x", null.asInstanceOf[java.lang.Long]), Row(2L, "x", 7L),
      Row(10L, "y", null.asInstanceOf[java.lang.Long]),
      Row(11L, "y", null.asInstanceOf[java.lang.Long])))
    val got = ExactDedup.withPriority(df, "doc_id", "text", "rank")
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(got(2L) == Some(7L), "scored copy wins over the unscored one")
    assert(got(10L).isEmpty, "all-unscored group keeps min id with null priority")
  }

  test("priority keeper matches plain ExactDedup when priority is constant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("rank", org.apache.spark.sql.functions.lit(0L))
    val plain = ExactDedup(docs, "doc_id", "text")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val prio = ExactDedup.withPriority(docs, "doc_id", "text", "rank")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(plain == prio)
  }

  test("distributionShift: identity PSI is exactly 0, shifts register per group only, hand-computed value") {
    val edges = Seq(10.0, 20.0)
    def snap(rows: Seq[Row]) =
      TestSpark.df("doc_id bigint, src string, len bigint", rows)
    val old = snap(Seq(
      Row(1L, "a", 5L), Row(2L, "a", 15L), Row(3L, "a", 25L),
      Row(4L, "b", 5L), Row(5L, "b", 15L)))
    // identity: p == q per bucket, every term an exact 0.0
    val same = CorpusDiff.distributionShift(old, old, "src", "len", edges,
      ordered = false).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(same("a") == ((3L, 3L, 0.0)) && same("b") == ((2L, 2L, 0.0)))
    // group b's shape shifts (both docs move to bucket 1); group a
    // unchanged — PSI must register ONLY for b, with the hand value
    val neu = snap(Seq(
      Row(1L, "a", 5L), Row(2L, "a", 15L), Row(3L, "a", 25L),
      Row(4L, "b", 5L), Row(5L, "b", 6L)))
    val got = CorpusDiff.distributionShift(old, neu, "src", "len", edges,
      ordered = false).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("a") == ((3L, 3L, 0.0)))
    // b: counts old (1,1,0) new (2,0,0), totals 2, B=3 → p=(2/5,2/5,1/5),
    // q=(3/5,1/5,1/5) smoothed; psi = Σ (p−q)·ln(p/q)
    val p = Seq(2.0 / 5, 2.0 / 5, 1.0 / 5)
    val q = Seq(3.0 / 5, 1.0 / 5, 1.0 / 5)
    val hand = BigDecimal(p.indices.map(i =>
      (p(i) - q(i)) * math.log(p(i) / q(i))).sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("b")._3 == hand && hand > 0.0)
    // deterministic under repartitioning
    val re = CorpusDiff.distributionShift(old.repartition(5),
      neu.repartition(3), "src", "len", edges, ordered = false).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(re == got.map { case (k, v) => k -> v._3 })
    intercept[IllegalArgumentException] {
      CorpusDiff.distributionShift(old, neu, "src", "len", Seq(20.0, 10.0))
    }
  }
}
