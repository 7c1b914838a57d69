package graft.llm

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Calibration-sweep laws (the corpus-scale table is oracle-pinned in
 * pq128, the consuming gate in pq129):
 *
 *  - closed form on hand scores: bin assignment, per-bin positive
 *    rate, cumulative docs/pos/precision in descending-bin order;
 *  - the cumulative columns equal re-aggregating the raw rows at each
 *    threshold (the sweep IS the one-pass replacement);
 *  - pickScoreThreshold returns the LOWEST clearing bin's lower bound,
 *    None when nothing clears;
 *  - null labels/scores are excluded; knob guards refuse.
 */
class CalibrationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // (score, label): bins at width 10 -> bucket 2: 2 docs 2 pos;
  // bucket 1: 2 docs 1 pos; bucket 0: 3 docs 1 pos; bucket -1: 1 doc 0 pos
  private val rows = Seq(
    (25.0, 1L), (20.0, 1L),
    (15.0, 1L), (10.0, 0L),
    (9.9, 0L), (5.0, 1L), (0.0, 0L),
    (-0.1, 0L))
  private def scored = rows.toDF("score", "y")

  private def sweep = QualityClassifier.calibrationSweep(
    scored, "score", "y", binWidth = 10.0, ordered = false)

  test("closed form: bins, rates, and descending cumulative columns") {
    val got = sweep.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5),
      r.getDouble(6))).sortBy(-_._1)
    assert(got.toSeq == Seq(
      (2L, 2L, 2L, 1.0, 2L, 2L, 1.0),
      (1L, 2L, 1L, 0.5, 4L, 3L, 0.75),
      (0L, 3L, 1L, round6(1.0 / 3), 7L, 4L, round6(4.0 / 7)),
      (-1L, 1L, 0L, 0.0, 8L, 4L, 0.5)))
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  test("cumulative columns equal re-aggregation at each threshold") {
    sweep.collect().foreach { r =>
      val b = r.getLong(0)
      val keep = rows.filter(_._1 >= b * 10.0)
      assert(r.getLong(4) == keep.size && r.getLong(5) == keep.map(_._2).sum,
        s"bucket $b cumulative mismatch")
    }
  }

  test("pickScoreThreshold: lowest clearing bin's lower bound; None when nothing clears") {
    assert(QualityClassifier.pickScoreThreshold(sweep, 0.75, binWidth = 10.0)
      .contains(10.0))
    assert(QualityClassifier.pickScoreThreshold(sweep, 0.5, binWidth = 10.0)
      .contains(-10.0))
    assert(QualityClassifier.pickScoreThreshold(sweep, 0.99, binWidth = 10.0)
      .contains(20.0))
    val flat = Seq((1.0, 0L), (2.0, 0L)).toDF("score", "y")
    val fs = QualityClassifier.calibrationSweep(flat, "score", "y")
    assert(QualityClassifier.pickScoreThreshold(fs, 0.5).isEmpty)
  }

  test("null labels and scores are excluded") {
    val withNulls = spark.createDataFrame(Seq[(java.lang.Double, java.lang.Long)](
      (25.0, 1L), (java.lang.Double.valueOf(5.0), null), (null, 1L)))
      .toDF("score", "y")
    val got = QualityClassifier.calibrationSweep(withNulls, "score", "y",
      binWidth = 10.0).collect()
    assert(got.length == 1 && got.head.getLong(1) == 1)
  }

  test("knob guards") {
    intercept[IllegalArgumentException](
      QualityClassifier.calibrationSweep(scored, "score", "y", binWidth = 0.0))
    intercept[IllegalArgumentException](
      QualityClassifier.pickScoreThreshold(sweep, 0.0))
  }
}
