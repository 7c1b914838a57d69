package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Triplet-mining laws:
 *
 *  - TRANSITIVE EXCLUSION: a candidate in the anchor's duplicate
 *    CLUSTER is never a negative, even with no direct pair to the
 *    anchor (the false-negative case the operator exists for).
 *  - Positives are the DIRECT pair-mates, both orientations.
 *  - Anchors without a positive emit nothing; self never a negative;
 *    neg_rank is dense in retriever order and capped at negK.
 *  - Deterministic under repartitioning.
 */
class ContrastiveMiningSpec extends AnyFunSuite {
  import TestSpark.spark

  private def fixture() = {
    val pairs = TestSpark.df("id_a bigint, id_b bigint", Seq(
      Row(1L, 2L), Row(2L, 3L), Row(10L, 11L)))
    // clusters: {1,2,3} (1~3 only transitively), {10,11}
    val results = TestSpark.df("qid bigint, cid bigint, rnk bigint", Seq(
      Row(1L, 3L, 1L),   // cluster-mate of 1 with NO direct pair — excluded
      Row(1L, 10L, 2L),
      Row(1L, 99L, 3L),
      Row(1L, 2L, 4L),   // direct mate — excluded
      Row(2L, 1L, 1L),   // cluster-mate — excluded
      Row(2L, 50L, 2L),
      Row(99L, 1L, 1L),  // anchor 99 has no positive — dropped entirely
      Row(10L, 10L, 1L), // self — excluded
      Row(10L, 11L, 2L), // cluster-mate — excluded
      Row(10L, 1L, 3L)))
    (pairs, results)
  }

  test("transitive cluster exclusion, direct-pair positives, dense capped neg_rank") {
    val (pairs, results) = fixture()
    val got = ContrastiveMining.triplets(pairs, results, negK = 2,
      ordered = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 2L, 10L, 1L), (1L, 2L, 99L, 2L), // 3 skipped though ranked 1st
      (2L, 1L, 50L, 1L), (2L, 3L, 50L, 1L), // both orientations of 2's mates
      (10L, 11L, 1L, 1L)))                  // self and 11 skipped
    // anchors 3/11 have positives but no retriever rows; 99 the reverse
    assert(!got.exists(t => Set(3L, 11L, 99L)(t._1)))
  }

  test("negK caps the fan-out; deterministic under repartitioning") {
    val (pairs, results) = fixture()
    val one = ContrastiveMining.triplets(pairs, results, negK = 1,
      ordered = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(one == Set((1L, 2L, 10L, 1L), (2L, 1L, 50L, 1L),
      (2L, 3L, 50L, 1L), (10L, 11L, 1L, 1L)))
    val re = ContrastiveMining.triplets(pairs.repartition(5),
      results.repartition(7), negK = 1, ordered = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(re == one)
    intercept[IllegalArgumentException] {
      ContrastiveMining.triplets(pairs, results, negK = 0)
    }
  }

  test("plan: no cartesian product anywhere in the triplet join chain") {
    val (pairs, results) = fixture()
    val plan = ContrastiveMining.triplets(pairs, results, negK = 2,
      ordered = false).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"triplets went all-pairs:\n$plan")
  }
}
