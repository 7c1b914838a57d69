package graft.llm

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pair-evaluation laws:
 *
 *  - CANONICAL: orientation and duplicates never double-count — (2,1)
 *    and (1,2) are one pair on either side.
 *  - ARITHMETIC: P = hit/pred, R = hit/truth, F1 = 2·hit/(pred+truth)
 *    (the harmonic identity — one division, no compounded rounding).
 *  - EDGES: an empty side nulls its ratio; both empty nulls all three
 *    with zero counts; deterministic under repartitioning.
 */
class DedupEvalSpec extends AnyFunSuite {
  import TestSpark.spark

  private def pairs(rows: (Long, Long)*) =
    TestSpark.df("doc_a bigint, doc_b bigint",
      rows.map { case (a, b) => Row(a, b) })

  test("canonicalization, exact ratios, harmonic F1") {
    val pred = pairs((1L, 2L), (2L, 1L), (3L, 4L), (5L, 6L)) // (2,1) folds
    val truth = pairs((1L, 2L), (4L, 3L), (7L, 8L))
    val r = DedupEval.evalPairs(pred, truth).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)))
    assert(r.getDouble(3) == 0.666667 && r.getDouble(4) == 0.666667)
    assert(r.getDouble(5) == 0.666667) // 2·2/(3+3)
    val re = DedupEval.evalPairs(pred.repartition(5), truth.repartition(3))
      .collect().head
    assert(re.toSeq == r.toSeq)
  }

  test("empty sides null their ratios instead of dividing by zero") {
    val some = pairs((1L, 2L))
    val none = pairs()
    val noPred = DedupEval.evalPairs(none, some).collect().head
    assert(noPred.getLong(0) == 0L && noPred.isNullAt(3) &&
      noPred.getDouble(4) == 0.0 && noPred.getDouble(5) == 0.0)
    val noTruth = DedupEval.evalPairs(some, none).collect().head
    assert(noTruth.getLong(1) == 0L && noTruth.getDouble(3) == 0.0 &&
      noTruth.isNullAt(4) && noTruth.getDouble(5) == 0.0)
    val empty = DedupEval.evalPairs(none, none).collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.getLong(2) == 0L && empty.isNullAt(3) && empty.isNullAt(4) &&
      empty.isNullAt(5))
  }

  test("sweepThresholds: one pass yields the whole monotone curve; max-score canonicalization") {
    val scored = TestSpark.df("doc_a bigint, doc_b bigint, score double", Seq(
      Row(1L, 2L, 0.9), Row(2L, 1L, 0.6), // same pair — max wins (0.9)
      Row(3L, 4L, 0.75), Row(5L, 6L, 0.5)))
    val truth = pairs((1L, 2L), (3L, 4L), (7L, 8L))
    val curve = DedupEval.sweepThresholds(scored, truth, "score",
      Seq(0.5, 0.7, 0.8), ordered = true).collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(curve(0.5) == ((3L, 3L, 2L))) // all three pairs predicted
    assert(curve(0.7) == ((2L, 3L, 2L))) // 0.5 drops out; (1,2) kept at 0.9
    assert(curve(0.8) == ((1L, 3L, 1L))) // only (1,2) survives
    // n_pred is monotone non-increasing in threshold; n_truth constant
    val byT = curve.toSeq.sortBy(_._1).map(_._2)
    assert(byT.sliding(2).forall { case Seq(a, b) => b._1 <= a._1 })
    assert(byT.map(_._2).distinct == Seq(3L))
    // at-threshold membership is inclusive (>=): a 0.75 score at cut 0.75
    val inc = DedupEval.sweepThresholds(scored, truth, "score",
      Seq(0.75), ordered = false).collect().head
    assert(inc.getLong(1) == 2L, s"0.75 >= 0.75 must predict: $inc")
    intercept[IllegalArgumentException] {
      DedupEval.sweepThresholds(scored, truth, "score", Seq(0.8, 0.7))
    }
  }

  test("self-evaluation is perfect: a method against itself reads 1/1/1") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mh = MinHashNearDup(d, "doc_id", "text", shingleN = 3,
      numHashes = 9, bands = 3, threshold = 0.8, ordered = false)
    val r = DedupEval.evalPairs(mh, mh).collect().head
    assert(r.getLong(0) == r.getLong(1) && r.getLong(1) == r.getLong(2))
    assert(r.getLong(0) > 0, "fixture must produce pairs")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 &&
      r.getDouble(5) == 1.0)
  }
}
