package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DupClustersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def clusters(pairs: Seq[(Long, Long)],
      maxRounds: Int = 20): Map[Long, Long] =
    DupClusters(pairs.toDF("a", "b"), "a", "b", maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain merges into one cluster; disjoint pair stays apart") {
    // a~b, b~c must drop TWO docs behind one keeper — pairwise handling
    // alone would keep b once and drop it once
    val got = clusters(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("min label wins regardless of pair orientation and discovery order") {
    // the smallest id sits at the END of a reversed chain: propagation
    // must walk the full diameter, not just one hop
    val got = clusters(Seq((9L, 8L), (8L, 7L), (7L, 6L), (6L, 5L), (5L, 4L)))
    assert(got == (4L to 9L).map(_ -> 4L).toMap)
  }

  test("star and cycle shapes converge to the component min") {
    val star = clusters(Seq((100L, 7L), (100L, 8L), (100L, 9L)))
    assert(star == Map(100L -> 7L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
    val cycle = clusters(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(cycle == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("sizeHistogram: sizes include the keeper; rollup is exact; empty in, empty out") {
    // components: {1,2,3} size 3, {10,11} size 2, {20,21} size 2
    val cl = DupClusters(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a", "b"), "a", "b")
    val got = DupClusters.sizeHistogram(cl, ordered = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 2L))
    assert(DupClusters.sizeHistogram(cl.filter("doc_id < 0")).count() == 0)
  }

  test("empty pair set yields an empty result, no iteration") {
    // a corpus with no near-dups must flow through (the fuzzy stages
    // legitimately emit zero pairs at small scale factors)
    assert(clusters(Seq.empty) == Map.empty)
  }

  test("exhausting the round cap before convergence throws, never returns partial labels") {
    // a 6-node path with maxRounds = 1: the far end cannot reach the
    // global min in one hop+jump, and a partially-propagated result is
    // silently WRONG downstream (docs kept under the wrong keeper) —
    // the operator must refuse, not return it
    val ex = intercept[IllegalStateException] {
      clusters(Seq((2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L)), maxRounds = 1)
    }
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("deep chain converges in O(log diameter) rounds (pointer jumping)") {
    // a 100-node path with the global min at the far end: pure one-hop
    // label propagation needs ~99 rounds; the pointer jump halves the
    // remaining chain depth each round, so the default cap of 20
    // (>> log2(100) + slack) must suffice
    val pairs = (1L until 100L).map(i => (i + 1, i))
    val got = clusters(pairs)
    assert(got == (1L to 100L).map(_ -> 1L).toMap)
  }
}
